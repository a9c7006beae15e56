"""Utilities: testing helpers, roofline math."""
