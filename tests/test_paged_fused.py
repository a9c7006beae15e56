"""Fused-layout paged decode tests: parity with the vLLM-layout kernel and
the dense oracle, layout round trips, quantized variant, fused append."""

import jax.numpy as jnp
import numpy as np
import pytest

from aule_tpu.ops.paged import paged_attention
from aule_tpu.ops.paged_fused import (
    from_fused_layout,
    kv_cache_append_decode_fused,
    paged_attention_fused,
    to_fused_layout,
)
from aule_tpu.ops.quant import quantize_kv
from aule_tpu.ops.reference import paged_attention_reference
from aule_tpu.utils.testing import assert_close
from tests.test_paged import make_cache


def test_layout_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((2, 8, 16, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 8, 16, 32)), jnp.float32)
    kv = to_fused_layout(k, v)
    assert kv.shape == (8, 2, 2, 16, 32)
    k2, v2 = from_fused_layout(kv)
    np.testing.assert_array_equal(np.asarray(k), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2), (16, 4)])
def test_fused_matches_oracle(hq, hkv):
    batch, d, page = 4, 64, 16
    ctx = np.array([37, 128, 5, 250], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 128, page, 16, ctx)
    q = np.random.default_rng(1).standard_normal((batch, hq, d)).astype(
        np.float32)
    kv = to_fused_layout(jnp.asarray(k_pages), jnp.asarray(v_pages))
    got = paged_attention_fused(
        jnp.asarray(q), kv, jnp.asarray(bt), jnp.asarray(ctx),
        pages_per_compute_block=4)
    want = paged_attention_reference(q, k_pages, v_pages, bt, ctx)
    assert_close(got, np.asarray(want), 2e-5, 2e-5, f"fused {hq}:{hkv}")


def test_fused_matches_headmajor_kernel():
    batch, hq, hkv, d, page = 2, 8, 2, 64, 16
    ctx = np.array([100, 64], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 64, page, 8, ctx)
    q = np.random.default_rng(2).standard_normal((batch, hq, d)).astype(
        np.float32)
    a = paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(ctx), pages_per_compute_block=2)
    kv = to_fused_layout(jnp.asarray(k_pages), jnp.asarray(v_pages))
    b = paged_attention_fused(
        jnp.asarray(q), kv, jnp.asarray(bt), jnp.asarray(ctx),
        pages_per_compute_block=2)
    assert_close(np.asarray(a), np.asarray(b), 1e-6, 1e-6, "fused-vs-hm")


def test_fused_window_and_zero_ctx():
    batch, hq, hkv, d, page = 2, 4, 4, 64, 16
    ctx = np.array([200, 0], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 64, page, 16, ctx)
    q = np.random.default_rng(3).standard_normal((batch, hq, d)).astype(
        np.float32)
    kv = to_fused_layout(jnp.asarray(k_pages), jnp.asarray(v_pages))
    got = np.asarray(paged_attention_fused(
        jnp.asarray(q), kv, jnp.asarray(bt), jnp.asarray(ctx),
        window_size=64, pages_per_compute_block=2))
    want = np.asarray(paged_attention_reference(
        q, k_pages, v_pages, bt, ctx, window_size=64))
    assert np.isfinite(got).all()
    assert np.abs(got[1]).max() == 0.0
    assert_close(got, want, 2e-5, 2e-5, "fused-window")


def test_fused_quantized():
    batch, hq, hkv, d, page = 4, 8, 2, 64, 16
    ctx = np.array([37, 128, 5, 250], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 128, page, 16, ctx)
    q = np.random.default_rng(4).standard_normal((batch, hq, d)).astype(
        np.float32)
    kq, ks = quantize_kv(jnp.asarray(k_pages), jnp.int8)
    vq, vs = quantize_kv(jnp.asarray(v_pages), jnp.int8)
    kv, sc = to_fused_layout(kq, vq, ks, vs)
    got = paged_attention_fused(
        jnp.asarray(q), kv, jnp.asarray(bt), jnp.asarray(ctx),
        kv_scales=sc, pages_per_compute_block=4)
    want = np.asarray(paged_attention_reference(q, k_pages, v_pages, bt, ctx))
    err = np.abs(np.asarray(got) - want).max()
    assert err < 2e-2, f"fused quantized err {err}"


def test_fused_append_then_attend():
    batch, hq, hkv, d, page = 2, 4, 2, 64, 16
    num_pages, max_pages = 32, 8
    rng = np.random.default_rng(5)
    kv = jnp.zeros((num_pages, 2, hkv, page, d), jnp.float32)
    bt = jnp.asarray(
        np.arange(batch * max_pages, dtype=np.int32).reshape(batch, max_pages))
    ctx = jnp.zeros((batch,), jnp.int32)
    ks, vs = [], []
    for t in range(20):
        k_new = rng.standard_normal((batch, hkv, d)).astype(np.float32)
        v_new = rng.standard_normal((batch, hkv, d)).astype(np.float32)
        ks.append(k_new)
        vs.append(v_new)
        kv, ctx = kv_cache_append_decode_fused(
            kv, jnp.asarray(k_new), jnp.asarray(v_new), bt, ctx)
    q = rng.standard_normal((batch, hq, d)).astype(np.float32)
    got = paged_attention_fused(jnp.asarray(q), kv, bt, ctx,
                                pages_per_compute_block=2)
    from aule_tpu.ops.reference import attention_reference_numpy

    want = attention_reference_numpy(
        q[:, :, None, :], np.stack(ks, 2), np.stack(vs, 2))[:, :, 0]
    assert_close(np.asarray(got), want, 2e-5, 2e-5, "fused-append")
