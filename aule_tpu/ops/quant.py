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

import jax
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


def e4m3_expand(x_i8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Expand float8_e4m3fn payloads BITCAST AS INT8 to a float dtype
    using integer ops only — no fp8 dtype ever reaches the compiler.

    v5e has no fp8 hardware path, and Mosaic's software float8 cast is
    ~6x slower than the int8 pipeline (round-3 verdict).  The bit layout
    does the work instead: e4m3fn is s|eeee|mmm (bias 7), f32 is
    s|e8|m23 (bias 127), so for normals the f32 bits are simply the
    7-bit exp+mantissa field shifted into place plus the bias delta:

        f32_bits = ((x & 0x7f) << 20) + (120 << 23)

    (monotone-linear in the packed field — one shift + one add per
    element, VPU-friendly).  Subnormals (exp field 0) decode exactly as
    m * 2^-9 via a select; e4m3fn NaN (0x7f) cannot occur in pools
    (quantize_kv clips to +-448).  Exact for every value quantize_kv
    can produce, verified bit-for-bit against XLA's own cast in
    tests/test_quant.py."""
    xi = x_i8.astype(jnp.int32)
    em = jnp.bitwise_and(xi, 0x7F)
    mag = jax.lax.bitcast_convert_type(
        (em << 20) + (120 << 23), jnp.float32)
    sub = jnp.bitwise_and(em, 0x7).astype(jnp.float32) * (2.0 ** -9)
    mag = jnp.where(em < 8, sub, mag)
    return jnp.where(xi < 0, -mag, mag).astype(dtype)


# e4m3_expand_scaled returns value * 2^-E4M3_EXPAND_SHIFT; the kernels
# fold 2^+shift into their per-block scale-factor tiles (one multiply
# per [Hkv, tokens] tile instead of per payload element)
E4M3_EXPAND_SHIFT = 40


def e4m3_expand_scaled(x_i8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """e4m3_expand's fast path: returns VALUE * 2^-40, select-free.

    The classic half->float magic-multiply, adapted to e4m3: placing
    the 7-bit exp+mantissa field at the f32 exponent boundary
    (`em << 20`) makes normals read as 2^(e-127)·(1+m/8) and
    subnormals as f32 subnormals m·2^-129; ONE power-of-two multiply
    (2^80) then maps BOTH to value·2^-40 exactly (power-of-two scaling
    is rounding-free, and the f32 subnormal→normal promotion under it
    is exact).  The sign bit ORs into place, so there are no selects
    and no compares — 8 integer/float ops per element vs
    e4m3_expand's 13+2 selects.  The 2^-40 bias keeps q·k products
    ~2^-40 (no overflow risk the +2^120 direction would have); callers
    multiply their score/probability factor tiles by
    2^E4M3_EXPAND_SHIFT.  Bit-exact vs e4m3_expand(x) * 2^-40 on all
    254 non-NaN codes (tests/test_quant.py); garbage bytes in dead
    cache slots can never produce NaN/Inf here (the exponent field
    maxes at 2^(15-127))."""
    xi = x_i8.astype(jnp.int32)
    bits = jnp.bitwise_or(
        (jnp.bitwise_and(xi, 0x80) << 24),
        (jnp.bitwise_and(xi, 0x7F) << 20))
    return (jax.lax.bitcast_convert_type(bits, jnp.float32)
            * jnp.float32(2.0 ** (120 - E4M3_EXPAND_SHIFT))).astype(dtype)
