"""Compute ops: reference, Pallas kernels, RoPE, paged decode, quantization."""
