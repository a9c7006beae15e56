"""Serving: KV-cache pool/table management and continuous batching."""
