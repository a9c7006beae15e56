"""Paged decode kernel + KV-cache append op tests.

Reference analogs: tests/test_paged_python.py (paged vs contiguous
reference), test_real_transformer.py (prefill + token-by-token decode with
a growing cache), plus block-table edge cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aule_tpu.ops.paged import (
    kv_cache_append_decode,
    kv_cache_append_prefill,
    paged_attention,
)
from aule_tpu.ops.reference import (
    attention_reference_numpy,
    paged_attention_reference,
)
from aule_tpu.utils.testing import assert_close, random_qkv


def make_cache(batch, hkv, d, num_pages, page_size, max_pages, ctx_lens,
               seed=42):
    """Random paged cache with a shuffled (non-identity) block table."""
    rng = np.random.default_rng(seed)
    k_pages = rng.standard_normal((hkv, num_pages, page_size, d)).astype(
        np.float32)
    v_pages = rng.standard_normal((hkv, num_pages, page_size, d)).astype(
        np.float32)
    # assign shuffled distinct physical pages per sequence
    perm = rng.permutation(num_pages)
    bt = np.full((batch, max_pages), -1, np.int32)
    used = 0
    for b in range(batch):
        n = -(-ctx_lens[b] // page_size)
        bt[b, :n] = perm[used:used + n]
        used += n
    return k_pages, v_pages, bt


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2), (16, 4)])
def test_paged_decode_vs_oracle(hq, hkv):
    batch, d, page = 4, 64, 16
    ctx = np.array([37, 128, 5, 250], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 128, page, 16, ctx)
    q = np.random.default_rng(1).standard_normal((batch, hq, d)).astype(
        np.float32)
    got = paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(ctx), pages_per_compute_block=4,
    )
    want = paged_attention_reference(q, k_pages, v_pages, bt, ctx)
    assert_close(got, np.asarray(want), 2e-5, 2e-5, f"paged {hq}:{hkv}")


def test_paged_decode_matches_contiguous():
    """Paged result == dense attention over the gathered context."""
    batch, hq, hkv, d, page = 2, 8, 2, 64, 16
    ctx = np.array([100, 64], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 64, page, 8, ctx)
    q = np.random.default_rng(2).standard_normal((batch, hq, d)).astype(
        np.float32)
    got = np.asarray(paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(ctx), pages_per_compute_block=2,
    ))
    for b in range(batch):
        n_pages = -(-int(ctx[b]) // page)
        kc = k_pages[:, bt[b, :n_pages]].reshape(hkv, -1, d)[:, :ctx[b]]
        vc = v_pages[:, bt[b, :n_pages]].reshape(hkv, -1, d)[:, :ctx[b]]
        want = attention_reference_numpy(
            q[b:b + 1, :, None, :].reshape(1, hq, 1, d),
            kc[None], vc[None],
        )[0, :, 0]
        assert_close(got[b], want, 3e-5, 3e-5, f"seq {b}")


def test_paged_decode_window():
    batch, hq, hkv, d, page = 2, 4, 4, 64, 16
    ctx = np.array([200, 90], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 64, page, 16, ctx)
    q = np.random.default_rng(3).standard_normal((batch, hq, d)).astype(
        np.float32)
    got = paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(ctx), window_size=64,
        pages_per_compute_block=2,
    )
    want = paged_attention_reference(
        q, k_pages, v_pages, bt, ctx, window_size=64)
    assert_close(got, np.asarray(want), 2e-5, 2e-5, "paged-window")


def test_append_decode_then_attend():
    """Token-by-token decode loop with cache growth (test_real_transformer
    analog): append K/V for each new token, then paged attention must see
    it."""
    batch, hq, hkv, d, page = 2, 4, 2, 64, 16
    num_pages, max_pages = 32, 8
    rng = np.random.default_rng(5)
    k_pages = jnp.zeros((hkv, num_pages, page, d), jnp.float32)
    v_pages = jnp.zeros((hkv, num_pages, page, d), jnp.float32)
    bt = jnp.asarray(
        np.arange(batch * max_pages, dtype=np.int32).reshape(batch, max_pages))
    ctx = jnp.zeros((batch,), jnp.int32)

    ks, vs = [], []
    steps = 20
    for t in range(steps):
        k_new = rng.standard_normal((batch, hkv, d)).astype(np.float32)
        v_new = rng.standard_normal((batch, hkv, d)).astype(np.float32)
        ks.append(k_new)
        vs.append(v_new)
        k_pages, v_pages, ctx = kv_cache_append_decode(
            k_pages, v_pages, jnp.asarray(k_new), jnp.asarray(v_new), bt, ctx)

    q = rng.standard_normal((batch, hq, d)).astype(np.float32)
    got = paged_attention(
        jnp.asarray(q), k_pages, v_pages, bt, ctx,
        pages_per_compute_block=2)

    k_seq = np.stack(ks, axis=2)  # [B, Hkv, T, D]
    v_seq = np.stack(vs, axis=2)
    want = attention_reference_numpy(
        q[:, :, None, :], k_seq, v_seq)[:, :, 0]
    assert_close(got, want, 2e-5, 2e-5, "decode-loop")


def test_append_prefill_then_decode():
    batch, hq, hkv, d, page = 2, 4, 2, 64, 16
    num_pages, max_pages = 32, 8
    rng = np.random.default_rng(6)
    k_pages = jnp.zeros((hkv, num_pages, page, d), jnp.float32)
    v_pages = jnp.zeros((hkv, num_pages, page, d), jnp.float32)
    bt = jnp.asarray(
        np.arange(batch * max_pages, dtype=np.int32).reshape(batch, max_pages))
    ctx = jnp.zeros((batch,), jnp.int32)

    seq = 48
    seq_lens = np.array([48, 30], np.int32)
    k_new = rng.standard_normal((batch, hkv, seq, d)).astype(np.float32)
    v_new = rng.standard_normal((batch, hkv, seq, d)).astype(np.float32)
    k_pages, v_pages, ctx = kv_cache_append_prefill(
        k_pages, v_pages, jnp.asarray(k_new), jnp.asarray(v_new), bt, ctx,
        jnp.asarray(seq_lens))
    assert np.array_equal(np.asarray(ctx), seq_lens)

    q = rng.standard_normal((batch, hq, d)).astype(np.float32)
    got = np.asarray(paged_attention(
        jnp.asarray(q), k_pages, v_pages, bt, ctx,
        pages_per_compute_block=2))
    for b in range(batch):
        want = attention_reference_numpy(
            q[b:b + 1, :, None, :],
            k_new[b:b + 1, :, :seq_lens[b]],
            v_new[b:b + 1, :, :seq_lens[b]],
        )[0, :, 0]
        assert_close(got[b], want, 2e-5, 2e-5, f"prefill seq {b}")


def test_paged_zero_length_context_is_zero():
    """Sequences with no context must produce zeros, not NaN."""
    batch, hq, hkv, d, page = 2, 4, 4, 64, 16
    ctx = np.array([64, 0], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 32, page, 4, ctx)
    q = np.random.default_rng(8).standard_normal((batch, hq, d)).astype(
        np.float32)
    got = np.asarray(paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(ctx), pages_per_compute_block=2))
    assert np.isfinite(got).all()
    assert np.abs(got[1]).max() == 0.0


def test_paged_decode_empty_and_mixed_contexts():
    """Cross-batch DMA pipelining threads a slot-parity baton through the
    batch walk (paged.py::_paged_decode_kernel, mirroring paged_fused);
    empty (ctx=0) slots break the prefetch chain and successors must
    self-start.  Covers: leading empty, empty between live, trailing
    empty, and lengths splitting into different live-block counts."""
    ctx = np.array([0, 37, 0, 0, 250, 16, 0, 128], np.int32)
    batch, hkv, hq, d, page = len(ctx), 2, 8, 64, 16
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 64, page, 16, ctx)
    q = np.random.default_rng(7).standard_normal((batch, hq, d)).astype(
        np.float32)
    got = np.asarray(paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(ctx), pages_per_compute_block=2))
    want = np.asarray(paged_attention_reference(q, k_pages, v_pages, bt, ctx))
    live = ctx > 0
    assert_close(got[live], want[live], 2e-5, 2e-5, "mixed/empty ctx")
    assert np.isfinite(got).all()
    assert np.abs(got[~live]).max() == 0.0


def test_paged_decode_group_not_multiple_of_sublane():
    """GQA group 12 (hq=24, hkv=2): scratch rows slice at h*gp, which
    Mosaic requires 8-aligned — gp must pad UP TO A MULTIPLE of 8
    (max(8, 12)=12 would mis-align; review r3)."""
    batch, hq, hkv, d, page = 2, 24, 2, 64, 16
    ctx = np.array([37, 129], np.int32)
    k_pages, v_pages, bt = make_cache(batch, hkv, d, 32, page, 16, ctx)
    q = np.random.default_rng(11).standard_normal((batch, hq, d)).astype(
        np.float32)
    got = paged_attention(
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(bt), jnp.asarray(ctx), pages_per_compute_block=2)
    want = paged_attention_reference(q, k_pages, v_pages, bt, ctx)
    assert_close(got, np.asarray(want), 2e-5, 2e-5, "group-12 paged")
