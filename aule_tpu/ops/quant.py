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

    fp8-e4m3 payloads never contain subnormal byte codes: values whose
    nearest e4m3 representation is subnormal (|v| < 2^-6 of the scaled
    range, < 3.5e-5 of the token amax) are flushed to +-0 at encode
    time so the select-free in-kernel decoder is bit-exact on TPU
    hardware (see _flush_e4m3_subnormals).
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
        payload = _flush_e4m3_subnormals(payload)
    return payload, scale


def _flush_e4m3_subnormals(payload: jnp.ndarray) -> jnp.ndarray:
    """Flush the 14 subnormal e4m3 byte codes (0x01-0x07 / 0x81-0x87) to +-0.

    The TPU VPU flushes f32 subnormals to zero, so e4m3_expand_scaled's
    magic-multiply decodes subnormal codes as 0.0 on hardware (the
    subnormal->normal promotion the trick relies on is exact in IEEE
    semantics but not under flush-to-zero; measured on TPU v5 lite:
    bitcast(7<<20) * 2^80 == 0.0).  Rather than pay a select in the hot
    decode, encode-side we never emit those codes: a subnormal
    represents |v| < 2^-6 of the per-token 448-amax scaling, i.e.
    < 3.5e-5 of amax — far below the 5e-3 error target — so flushing
    at encode loses nothing measurable and makes every pool byte decode
    bit-exactly through BOTH e4m3_expand and e4m3_expand_scaled.
    Operates on the payload bits (not the pre-cast float) so the
    guarantee holds regardless of the cast's rounding mode."""
    bits = jax.lax.bitcast_convert_type(payload, jnp.int8)
    em = jnp.bitwise_and(bits.astype(jnp.int32), 0x7F)
    keep = jnp.logical_or(em == 0, em >= 8)
    sign_only = jnp.bitwise_and(bits, jnp.int8(-128))  # 0x80 sign bit
    return jax.lax.bitcast_convert_type(
        jnp.where(keep, bits, sign_only), payload.dtype)


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
    (`em << 20`) makes normals read as 2^(e-127)·(1+m/8); ONE
    power-of-two multiply (2^80) then maps them to value·2^-40 exactly
    (power-of-two scaling is rounding-free).  The sign bit ORs into
    place, so there are no selects and no compares — 8 integer/float
    ops per element vs e4m3_expand's 13+2 selects.  The 2^-40 bias
    keeps q·k products ~2^-40 (no overflow risk the +2^120 direction
    would have); callers multiply their score/probability factor tiles
    by 2^E4M3_EXPAND_SHIFT.

    Subnormal codes (0x01-0x07 / 0x81-0x87) land on f32 subnormals
    before the multiply, and the TPU VPU flushes f32 subnormals — so
    on hardware those 14 codes decode to +-0.0, NOT m·2^-9·2^-40
    (measured on TPU v5 lite: bitcast(7<<20) * 2^80 == 0.0; IEEE
    semantics, e.g. CPU/interpret mode, decode them exactly).  This is
    safe because `quantize_kv` never emits subnormal codes
    (_flush_e4m3_subnormals): every byte an aule pool can contain —
    +-0 and normals — decodes bit-exactly on both CPU and TPU
    (tests/test_quant.py pins the contract per-regime).  Garbage bytes
    in dead cache slots decode finite either way (the exponent field
    maxes at 2^(15-127)); the only caller-visible effect of the flush
    is that foreign subnormal bytes read as zero, an error < 2^-6 of
    the 448-amax payload scale (< 3.5e-5 of amax)."""
    xi = x_i8.astype(jnp.int32)
    bits = jnp.bitwise_or(
        (jnp.bitwise_and(xi, 0x80) << 24),
        (jnp.bitwise_and(xi, 0x7F) << 20))
    return (jax.lax.bitcast_convert_type(bits, jnp.float32)
            * jnp.float32(2.0 ** (120 - E4M3_EXPAND_SHIFT))).astype(dtype)


def e4m3_expand_scaled_bf16(x_i8: jnp.ndarray) -> jnp.ndarray:
    """VALUE * 2^-40 as bfloat16 via exact bit relocation at 16-bit
    lane width — the fp8 decode hot path (r5).

    e4m3 (s|eeee|mmm, bias 7) embeds EXACTLY in bf16 (s|e8|m7,
    bias 127): assembling bf16 bits as (s << 15) | (em << 4) reads as
    2^((em>>3) - 127) * (1 + m/8) = value * 2^-120 for normals, and
    one bf16 multiply by 2^(120-40) rescales to value * 2^-40 with no
    rounding (power-of-two, min magnitude 2^-126 * 2^80 = 2^-46 stays
    normal).  Every op runs in 16-bit lanes — twice the element
    density of e4m3_expand_scaled's i32 pipeline — and the result
    feeds the bf16 MXU without a narrowing cast, cutting the VPU
    expansion cost that held fp8 decode at ~60% of its
    speed-of-light (BENCH_GRID r4).

    Zero codes assemble to all-zero bits = exact +-0.  Subnormal
    codes (never emitted by quantize_kv — see
    _flush_e4m3_subnormals) land on bf16 subnormals, exact under
    IEEE semantics and flushed to 0 by the TPU VPU — byte-for-byte
    the same contract as e4m3_expand_scaled.  NaN codes (0x7f/0xff,
    impossible in pools) decode to finite 448*2^-40."""
    # Mosaic cannot legalize 16-bit shifts (arith.shli on i16), so the
    # shifts are constant multiplies and the disjoint-range OR is an
    # add: (s<<8) | (em<<4)  ==  s*256 + em*16.
    xi = x_i8.astype(jnp.int16)
    bits = (jnp.bitwise_and(xi, jnp.int16(0x80)) * jnp.int16(256)
            + jnp.bitwise_and(xi, jnp.int16(0x7F)) * jnp.int16(16))
    return (jax.lax.bitcast_convert_type(bits, jnp.bfloat16)
            * jnp.bfloat16(2.0 ** (120 - E4M3_EXPAND_SHIFT)))
