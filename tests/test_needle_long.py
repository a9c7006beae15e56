"""Long-context needle-in-haystack through the quantized paged pipeline.

BASELINE config 4: needle retrieval at long context with INT8/FP8 KV-cache
blocks (+ sliding-window interaction).  The needle here is a *semantic*
retrieval check: a distinctive K direction planted deep in a long context
must dominate the decode attention output, at quantized cache width, with
results matching the f32 cache decode closely.

Runs at S=8k on CPU interpret mode (S=32k variant marked slow/tpu).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from aule_tpu.ops.paged import paged_attention
from aule_tpu.ops.quant import quantize_kv
from aule_tpu.utils.testing import assert_close


def _build_needle_cache(ctx, hkv, d, page, needle_pos, rng):
    n_pages = ctx // page
    k_pages = (rng.standard_normal((hkv, n_pages + 1, page, d)) * 0.3
               ).astype(np.float32)
    v_pages = rng.standard_normal((hkv, n_pages + 1, page, d)).astype(
        np.float32)
    needle_dir = rng.standard_normal(d).astype(np.float32)
    needle_dir /= np.linalg.norm(needle_dir)
    needle_value = rng.standard_normal(d).astype(np.float32)
    pg, off = needle_pos // page, needle_pos % page
    k_pages[:, 1 + pg, off] = needle_dir * 12.0
    v_pages[:, 1 + pg, off] = needle_value
    bt = 1 + np.arange(n_pages, dtype=np.int32)[None, :]
    lens = np.array([ctx], np.int32)
    return k_pages, v_pages, bt, lens, needle_dir, needle_value


@pytest.mark.parametrize("qdtype", [jnp.int8, jnp.float8_e4m3fn])
@pytest.mark.parametrize("ctx,window", [(8192, -1), (8192, 4096)])
def test_needle_quantized_paged(ctx, window, qdtype):
    rng = np.random.default_rng(11)
    hq, hkv, d, page = 4, 2, 64, 16
    needle_pos = ctx - 2048  # inside the window when window=4096
    k_pages, v_pages, bt, lens, ndir, nval = _build_needle_cache(
        ctx, hkv, d, page, needle_pos, rng)
    q = np.broadcast_to(ndir * 8.0, (1, hq, d)).astype(np.float32)

    # f32 reference decode
    want = np.asarray(paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(lens), window_size=window))

    kq, ks = quantize_kv(jnp.asarray(k_pages), qdtype)
    vq, vs = quantize_kv(jnp.asarray(v_pages), qdtype)
    got = np.asarray(paged_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(bt), jnp.asarray(lens),
        k_scales=ks, v_scales=vs, window_size=window))

    # retrieval: output must align with the needle value in both widths
    for out in (want, got):
        cos = float(np.dot(out[0, 0], nval)
                    / (np.linalg.norm(out[0, 0]) * np.linalg.norm(nval)))
        assert cos > 0.9, f"needle lost (cos={cos}, window={window})"
    # e4m3's 3-bit mantissa carries ~4x the int8 step at these magnitudes
    tol = 2e-2 if qdtype == jnp.int8 else 6e-2
    assert_close(got, want, 0, tol,
                 f"{jnp.dtype(qdtype).name} vs f32 ctx={ctx} window={window}")


def test_needle_outside_window_is_forgotten():
    """A needle older than the sliding window must NOT be retrieved —
    validates the decode window semantics end-to-end."""
    rng = np.random.default_rng(12)
    hq, hkv, d, page, ctx = 2, 2, 64, 16, 4096
    needle_pos = 100  # ancient token
    k_pages, v_pages, bt, lens, ndir, nval = _build_needle_cache(
        ctx, hkv, d, page, needle_pos, rng)
    q = np.broadcast_to(ndir * 8.0, (1, hq, d)).astype(np.float32)
    out = np.asarray(paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(lens), window_size=512))
    cos = float(np.dot(out[0, 0], nval)
                / (np.linalg.norm(out[0, 0]) * np.linalg.norm(nval) + 1e-9))
    assert cos < 0.5, f"expired needle leaked through window (cos={cos})"


@pytest.mark.slow
@pytest.mark.tpu
def test_needle_32k_quantized():
    """Full BASELINE config-4 scale; compiled kernels on a real TPU."""
    rng = np.random.default_rng(13)
    hq, hkv, d, page, ctx = 8, 2, 128, 16, 32768
    k_pages, v_pages, bt, lens, ndir, nval = _build_needle_cache(
        ctx, hkv, d, page, ctx - 5000, rng)
    q = np.broadcast_to(ndir * 8.0, (1, hq, d)).astype(np.float32)
    kq, ks = quantize_kv(jnp.asarray(k_pages), jnp.int8)
    vq, vs = quantize_kv(jnp.asarray(v_pages), jnp.int8)
    got = np.asarray(paged_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(bt), jnp.asarray(lens),
        k_scales=ks, v_scales=vs, window_size=8192, interpret=False))
    cos = float(np.dot(got[0, 0], nval)
                / (np.linalg.norm(got[0, 0]) * np.linalg.norm(nval)))
    assert cos > 0.9
