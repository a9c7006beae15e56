"""Quantized KV-cache: INT8 / FP8 payloads with per-token scales.

Net-new capability vs the reference (BASELINE.json extension; the reference
tops out at fp16 storage, shaders/attention_f16_amd.comp).  Pattern follows
INT-FlashAttention (PAPERS.md): per-token amax scales stored alongside the
payload pool, dequantized *inside* the attention kernel — the payload is
never materialized at full width in HBM.

Scale folding keeps the dequant off the [T, D] tiles:
    softmax scores:  s  = (q @ k_int^T) * k_scale[None, :]
    value product:   pv = (p * v_scale[None, :]) @ v_int
i.e. dequant costs one [G, T] multiply per tile instead of two [T, D]
multiplies.  Payloads are cast to f32/bf16 on the way into the MXU.

Pool layout (mirrors ops/paged.py):
    payload: [Hkv, num_pages, page_size, D]  int8 | float8_e4m3fn
    scales:  [Hkv, num_pages, page_size]     float32
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

INT8_MAX = 127.0
FP8_MAX = 448.0  # e4m3 finite max


def _qmax(dtype) -> float:
    if dtype == jnp.int8:
        return INT8_MAX
    if dtype == jnp.float8_e4m3fn:
        return FP8_MAX
    raise ValueError(f"unsupported KV quant dtype {dtype}")


def quantize_kv(x: jnp.ndarray, dtype=jnp.int8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token (last-axis) amax quantization.

    x: [..., D] -> (payload [..., D] in `dtype`, scales [...] f32) with
    x ≈ payload * scales[..., None].
    """
    qmax = _qmax(dtype)
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax)
    scaled = xf / scale[..., None]
    if dtype == jnp.int8:
        payload = jnp.clip(jnp.round(scaled), -INT8_MAX, INT8_MAX).astype(
            jnp.int8)
    else:
        payload = jnp.clip(scaled, -FP8_MAX, FP8_MAX).astype(dtype)
    return payload, scale


def dequantize_kv(payload: jnp.ndarray, scale: jnp.ndarray,
                  dtype=jnp.float32) -> jnp.ndarray:
    return (payload.astype(jnp.float32) * scale[..., None]).astype(dtype)
