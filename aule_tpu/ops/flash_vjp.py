"""Trainable flash attention: custom_vjp with separate dQ and dKV kernels.

The reference's backward (triton_flash.py:242-351, attention_backward_f32.comp)
is KV-block-parallel and accumulates dQ (and dK/dV under GQA) with atomicAdd.
TPU has no useful global atomics, and doesn't need them: we split the backward
into
  * a q-parallel dQ kernel (grid over q blocks, reducing over kv blocks), and
  * a kv-parallel dK/dV kernel (grid over kv blocks, reducing over q blocks
    and, for GQA, over the q-heads sharing each kv head),
which is the idiomatic TPU decomposition (SURVEY.md §7 "hard parts").
Residuals saved are (q, k, v, o, lse) exactly like the reference's
ctx.save_for_backward (triton_flash.py:466-474); delta = rowsum(o * do) is
precomputed once and shared by both kernels (the reference's delta kernel,
triton_flash.py:353-379 — here a fused XLA reduction, no kernel needed).

RoPE composes outside this op: rotation is linear and orthogonal, so autodiff
through ops/rope.apply_rope gives exact gradients; the fused-RoPE kernel
remains the inference fast path (matching the reference, whose backward also
has no RoPE).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import get_config, get_tile_config
LOG2E = 1.4426950408889634

from .flash import (
    DEFAULT_MASK_VALUE,
    NUM_LANES,
    _cdiv,
    _kv_live_range,
    _round_up,
    flash_attention_fwd,
)


def _q_live_range(j, *, block_q, block_kv, causal, window, seq_q, n_q):
    """Inverse of _kv_live_range: q-block interval visible from kv block j."""
    k_lo = j * block_kv
    k_hi = (j + 1) * block_kv - 1
    if causal:
        q_min = k_lo  # q >= k
        q_max = seq_q - 1
        if window > 0:
            q_max = jnp.minimum(q_max, k_hi + window)  # q - k <= W
    else:
        q_min = 0
        q_max = seq_q - 1
        if window > 0:
            q_min = jnp.maximum(0, k_lo - window)
            q_max = jnp.minimum(seq_q - 1, k_hi + window)
    lo = q_min // block_q if causal or window > 0 else 0
    hi = q_max // block_q
    lo = jnp.clip(lo, 0, n_q - 1)
    hi = jnp.clip(hi, 0, n_q - 1)
    return lo, hi


def _bwd_tier_conds(i, j, *, block_q, block_kv, causal, window,
                    seq_q, seq_k, q_ragged, k_ragged):
    """(live, interior) for the [block_q x block_kv] tile (i, j).

    Mirrors the forward's tier algebra, plus the q-row bound (backward
    dK/dV ACCUMULATE, so padded q rows must never contribute)."""
    p0 = j * block_kv
    p1 = p0 + block_kv - 1
    q_lo = i * block_q
    q_hi = (i + 1) * block_q - 1
    true = jnp.full((), True)
    live = (p0 < seq_k) if k_ragged else true
    interior = (p1 < seq_k) if k_ragged else true
    if q_ragged:
        live = jnp.logical_and(live, q_lo < seq_q)
        interior = jnp.logical_and(interior, q_hi < seq_q)
    if causal:
        live = jnp.logical_and(live, q_hi >= p0)
        interior = jnp.logical_and(interior, q_lo >= p1)
    if window > 0:
        live = jnp.logical_and(live, q_lo - p1 <= window)
        interior = jnp.logical_and(interior, q_hi - p0 <= window)
        if not causal:
            live = jnp.logical_and(live, p0 - q_hi <= window)
            interior = jnp.logical_and(interior, p1 - q_lo <= window)
    return live, interior


def _mask_tile(i, j, block_q, block_kv, *, causal, window, seq_q, seq_k,
               q_ragged=True, k_ragged=True):
    shape = (block_q, block_kv)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * block_q
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + j * block_kv
    terms = []
    if k_ragged:
        terms.append(cols < seq_k)
    if q_ragged:
        terms.append(rows < seq_q)
    if causal:
        terms.append(rows >= cols)
    if window > 0:
        terms.append(rows - cols <= window)
        if not causal:
            terms.append(cols - rows <= window)
    mask = terms[0] if terms else jnp.full(shape, True)
    for t in terms[1:]:
        mask = jnp.logical_and(mask, t)
    return mask


def _group_mask(mask_pos, group):
    """Tile a positional [bq, bkv] mask over the group's sublane rows."""
    if group == 1:
        return mask_pos
    return jnp.broadcast_to(
        mask_pos[None], (group,) + mask_pos.shape
    ).reshape(group * mask_pos.shape[0], mask_pos.shape[1])


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_acc,
    *, scale, causal, window, group, block_q, block_kv, seq_q, seq_k,
    n_kv, q_ragged, k_ragged, diag_strips=0, banded=False, kv_blocks=0,
):
    """dQ: grid (B, Hkv, n_q, n_kv); the whole GQA head group's rows are
    flattened per K/V residency (K/V HBM traffic / `group`, like the
    forward), maskless interior tiles, 1-lane stat slices.

    diag_strips > 0 (wrapper gate: causal self-attention, group==1,
    block_q == block_kv compute chunks, nothing ragged) replaces the
    masked edge tier with the forward's diagonal-strip decomposition
    (flash.py::_diag_body): the block-aligned triangular tile runs as
    static row strips computing only live columns — 0.5 + 0.5/n of the
    tile's MXU work.  Backward has no online-softmax chain (p comes from
    the saved lse), so strips cost nothing but the extra matmul calls.

    banded=True (window > 0): the last grid axis walks only the live kv
    BAND of q-block i — ceil((bq+W)/bkv)+1 steps instead of every kv
    block — mirroring the forward's banded window schedule
    (flash.py::_win_kernel).  The actual kv block is lo(i) + band step;
    the tier algebra below sees the actual j, so over-covered band steps
    are dead (live=False) exactly like the old full walk's dead tiles."""
    i = pl.program_id(2)
    jb = pl.program_id(3)
    if banded:
        lo, _ = _kv_live_range(
            i, block_q=block_q, block_kv=block_kv, causal=causal,
            window=window, seq_k=seq_k, n_kv=kv_blocks)
        j = lo + jb
    else:
        j = jb
    rows = group * block_q
    d = q_ref.shape[-1]

    @pl.when(jb == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    live, interior = _bwd_tier_conds(
        i, j, block_q=block_q, block_kv=block_kv, causal=causal,
        window=window, seq_q=seq_q, seq_k=seq_k,
        q_ragged=False, k_ragged=k_ragged)
    if banded:
        # the band can overrun the last real kv block; the index map
        # clips the DMA back to it, so the step MUST be dead or the
        # clipped block would accumulate twice (the ragged checks are
        # off when the sequence is unpadded and don't catch this)
        in_range = j < kv_blocks
        live = jnp.logical_and(live, in_range)
        interior = jnp.logical_and(interior, in_range)
    # dq rows beyond seq_q are garbage but get sliced off by the wrapper,
    # so the q bound never forces a masked tier here (q_ragged=False);
    # masked COLUMNS do matter (they must not leak into dq).

    precision = (jax.lax.Precision.HIGHEST
                 if q_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    def _compute(masked: bool):
        q = q_ref[0].reshape(rows, d)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0].reshape(rows, d)
        lse = lse_ref[0].reshape(rows, NUM_LANES)[:, :1]
        di = di_ref[0].reshape(rows, NUM_LANES)[:, :1]

        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * (scale * LOG2E)  # log2-units; exp2 fast softmax
        if masked:
            mask = _group_mask(_mask_tile(
                i, j, block_q, block_kv, causal=causal, window=window,
                seq_q=seq_q, seq_k=seq_k, q_ragged=False,
                k_ragged=k_ragged), group)
            s2 = jnp.where(mask, s2, DEFAULT_MASK_VALUE)
        p = jnp.exp2(s2 - lse * LOG2E)
        if masked:
            p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = (p * (dp - di) * scale).astype(k_ref.dtype)
        dq_acc[...] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    def _diag():
        sh = block_q // diag_strips
        for t in range(diag_strips):
            rs = t * sh
            width = rs + sh
            q_t = q_ref[0, 0, rs:rs + sh]      # [sh, D] (group == 1)
            do_t = do_ref[0, 0, rs:rs + sh]
            lse_t = lse_ref[0, 0, rs:rs + sh, :1]
            di_t = di_ref[0, 0, rs:rs + sh, :1]
            k_w = k_ref[0, 0, :width]
            v_w = v_ref[0, 0, :width]
            s2 = jax.lax.dot_general(
                q_t, k_w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * (scale * LOG2E)
            rows_pos = jax.lax.broadcasted_iota(
                jnp.int32, (sh, width), 0) + i * block_q + rs
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (sh, width), 1) + j * block_kv
            tri = rows_pos >= cols
            p = jnp.exp2(jnp.where(tri, s2, DEFAULT_MASK_VALUE)
                         - lse_t * LOG2E)
            p = jnp.where(tri, p, 0.0)
            dp = jax.lax.dot_general(
                do_t, v_w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            ds = (p * (dp - di_t) * scale).astype(k_ref.dtype)
            dq_acc[rs:rs + sh] += jax.lax.dot_general(
                ds, k_w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )

    @pl.when(interior)
    def _interior():
        _compute(False)

    if diag_strips > 0:
        diag = (j * block_kv) == i * block_q
        @pl.when(diag)
        def _diag_tile():
            _diag()
    else:
        @pl.when(jnp.logical_and(live, jnp.logical_not(interior)))
        def _edge():
            _compute(True)

    @pl.when(jb == n_kv - 1)
    def _store():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype).reshape(
            group, block_q, d)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, causal, window, group, block_q, block_kv, seq_q, seq_k,
    n_q, q_ragged, k_ragged, banded=False, q_blocks=0,
):
    """dK/dV: grid (B, Hkv, n_kv, n_q).  The GQA group's q rows flatten
    into the CONTRACTION dim of both accumulating matmuls (dV += P^T dO,
    dK += dS^T Q), so the group needs no grid dim and every matmul is
    `group`x deeper — vs the r1 kernel's per-(group, q-block) passes.

    banded=True (window > 0): the last grid axis walks only the live q
    BAND of kv-block j (actual q block = lo(j) + band step), mirroring
    the banded dQ walk above."""
    j = pl.program_id(2)
    qb = pl.program_id(3)
    if banded:
        lo, _ = _q_live_range(
            j, block_q=block_q, block_kv=block_kv, causal=causal,
            window=window, seq_q=seq_q, n_q=q_blocks)
        qi = lo + qb
    else:
        qi = qb
    rows = group * block_q
    d = q_ref.shape[-1]

    @pl.when(qb == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    live, interior = _bwd_tier_conds(
        qi, j, block_q=block_q, block_kv=block_kv, causal=causal,
        window=window, seq_q=seq_q, seq_k=seq_k,
        q_ragged=q_ragged, k_ragged=False)
    if banded:
        # the band can overrun the last real q block; the index map
        # clips the DMA back to it, so the step MUST be dead or the
        # clipped block would contribute twice.  The q_ragged masks do
        # not catch this when seq_q is block-aligned (q_ragged=False):
        # an overrun step's assumed rows sit at seq_q..seq_q+W past a
        # near-edge kv block, the window term q_lo - p1 <= W holds, and
        # the clipped q data leaked into the last W columns of dk/dv
        # (r4 bug, caught by the r5 banded-strip cross-check; the dQ
        # kernel always had the mirror guard).
        in_range = qi < q_blocks
        live = jnp.logical_and(live, in_range)
        interior = jnp.logical_and(interior, in_range)
    # dk/dv columns beyond seq_k get sliced off by the wrapper
    # (k_ragged=False); masked q ROWS must not accumulate (q_ragged).

    precision = (jax.lax.Precision.HIGHEST
                 if q_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    def _compute(masked: bool):
        q = q_ref[0].reshape(rows, d)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0].reshape(rows, d)
        lse = lse_ref[0].reshape(rows, NUM_LANES)[:, :1]
        di = di_ref[0].reshape(rows, NUM_LANES)[:, :1]

        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * (scale * LOG2E)
        if masked:
            mask = _group_mask(_mask_tile(
                qi, j, block_q, block_kv, causal=causal, window=window,
                seq_q=seq_q, seq_k=seq_k, q_ragged=q_ragged,
                k_ragged=False), group)
            s2 = jnp.where(mask, s2, DEFAULT_MASK_VALUE)
        p = jnp.exp2(s2 - lse * LOG2E)
        if masked:
            p = jnp.where(mask, p, 0.0)

        # dV += P^T @ dO  (contraction over group*bq rows)
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dS = P * (dP - di) * scale; dK += dS^T @ Q
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = (p * (dp - di) * scale).astype(q_ref.dtype)
        dk_acc[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(interior)
    def _interior():
        _compute(False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(interior)))
    def _edge():
        _compute(True)

    @pl.when(qb == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _win_dq_kernel(
    *refs,
    scale: float,
    window: int,
    group: int,
    block_q: int,
    n_pre: int,
    strips: int,
):
    """Banded-strip window dQ: single pass, no scratch, no @pl.when.

    Mirrors the forward's _win_kernel (flash.py): grid =
    (batch, kv_heads, q_blocks); the q block's live kv band arrives as
    n_pre+1 separate K and V chunk inputs (index maps clamp below
    block 0; the cols >= 0 mask term kills clamped columns).  Strip t
    (q rows [rs, rs+sh) of every head in the group) sees its ENTIRE
    live span [rs-W, rs+sh) at once, so p comes straight from the
    saved lse and dq writes its rows directly — no (m, l) chain, no
    accumulation over kv steps.  This replaces the r4 "banded walk"
    (grid band of mostly-dead [bq, bkv] tiles) that capped windowed
    training at 24 TF/s effective (BENCH_GRID r4)."""
    refs = list(refs)
    n_in = n_pre + 1
    q_ref = refs.pop(0)
    k_refs = [refs.pop(0) for _ in range(n_in)]
    v_refs = [refs.pop(0) for _ in range(n_in)]
    do_ref, lse_ref, di_ref, dq_ref = refs

    i = pl.program_id(2)
    d = q_ref.shape[-1]
    sh = block_q // strips
    band = n_in * block_q

    precision = (jax.lax.Precision.HIGHEST
                 if q_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    def gather_cols(chunk_refs, lo: int, hi: int):
        parts = []
        for c in range(n_in):
            p0, p1 = max(lo, c * block_q), min(hi, (c + 1) * block_q)
            if p0 < p1:
                parts.append(chunk_refs[c][0, 0, p0 - c * block_q:
                                           p1 - c * block_q])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    for t in range(strips):
        rs = t * sh
        lo = max(0, (n_pre * block_q + rs - window)
                 // NUM_LANES * NUM_LANES)
        hi = min(band, _round_up(n_pre * block_q + rs + sh, NUM_LANES))
        w = hi - lo
        q = q_ref[0, :, rs:rs + sh].reshape(group * sh, d)
        do = do_ref[0, :, rs:rs + sh].reshape(group * sh, d)
        lse = lse_ref[0, :, rs:rs + sh, :1].reshape(group * sh, 1)
        di = di_ref[0, :, rs:rs + sh, :1].reshape(group * sh, 1)
        kk = gather_cols(k_refs, lo, hi)
        vv = gather_cols(v_refs, lo, hi)
        s2 = jax.lax.dot_general(
            q, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * (scale * LOG2E)                    # [g*sh, w] log2-units
        rows_pos = jax.lax.broadcasted_iota(
            jnp.int32, (sh, w), 0) + i * block_q + rs
        cols = (jax.lax.broadcasted_iota(jnp.int32, (sh, w), 1)
                + (i - n_pre) * block_q + lo)
        mask = jnp.logical_and(
            jnp.logical_and(rows_pos >= cols, cols >= 0),
            rows_pos - cols <= window)
        mask = _group_mask(mask, group)
        p = jnp.exp2(jnp.where(mask, s2, DEFAULT_MASK_VALUE)
                     - lse * LOG2E)
        p = jnp.where(mask, p, 0.0)
        dp = jax.lax.dot_general(
            do, vv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = (p * (dp - di) * scale).astype(kk.dtype)
        dq = jax.lax.dot_general(
            ds, kk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dq_ref[0, :, rs:rs + sh] = dq.astype(dq_ref.dtype).reshape(
            group, sh, d)


def _win_dkv_kernel(
    *refs,
    scale: float,
    window: int,
    group: int,
    block_q: int,
    n_post: int,
    strips: int,
    seq: int,
):
    """Banded-strip window dK/dV: the transposed band.

    grid = (batch, kv_heads, kv_blocks); kv block j's live q band
    (rows [j*bq, (j+1)*bq + W)) arrives as n_post+1 separate q, do,
    lse, di chunk inputs (index maps clamp above the last block; the
    rows < seq mask term kills clamped rows).  Strip t (kv cols
    [cs, cs+sh)) sees all its visible q rows [cs, cs+W+sh) at once:
    dv = p^T do and dk = ds^T q contract over the whole band span, so
    each strip writes its dk/dv columns directly — single pass, no
    accumulation over q steps."""
    refs = list(refs)
    n_in = n_post + 1
    q_refs = [refs.pop(0) for _ in range(n_in)]
    k_ref = refs.pop(0)
    v_ref = refs.pop(0)
    do_refs = [refs.pop(0) for _ in range(n_in)]
    lse_refs = [refs.pop(0) for _ in range(n_in)]
    di_refs = [refs.pop(0) for _ in range(n_in)]
    dk_ref, dv_ref = refs

    j = pl.program_id(2)
    d = k_ref.shape[-1]
    sh = block_q // strips
    band = n_in * block_q

    precision = (jax.lax.Precision.HIGHEST
                 if k_ref.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)

    def gather_rows(chunk_refs, lo: int, hi: int, width: int):
        parts = []
        for c in range(n_in):
            p0, p1 = max(lo, c * block_q), min(hi, (c + 1) * block_q)
            if p0 < p1:
                sl = chunk_refs[c][0, :, p0 - c * block_q:
                                   p1 - c * block_q]
                parts.append(sl[..., :width])
        out = parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=1)
        return out.reshape(group * (hi - lo), width)

    for t in range(strips):
        cs = t * sh
        # q rows visible from cols [cs, cs+sh): [cs, cs + W + sh)
        lo = cs // NUM_LANES * NUM_LANES
        hi = min(band, _round_up(cs + window + sh, NUM_LANES))
        w = hi - lo
        qq = gather_rows(q_refs, lo, hi, d)        # [g*w, D]
        do = gather_rows(do_refs, lo, hi, d)
        lse = gather_rows(lse_refs, lo, hi, NUM_LANES)[:, :1]
        di = gather_rows(di_refs, lo, hi, NUM_LANES)[:, :1]
        kk = k_ref[0, 0, cs:cs + sh]
        vv = v_ref[0, 0, cs:cs + sh]
        s2 = jax.lax.dot_general(
            qq, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * (scale * LOG2E)                        # [g*w, sh]
        rows_pos = (jax.lax.broadcasted_iota(jnp.int32, (w, sh), 0)
                    + j * block_q + lo)
        cols = (jax.lax.broadcasted_iota(jnp.int32, (w, sh), 1)
                + j * block_q + cs)
        mask = jnp.logical_and(
            jnp.logical_and(rows_pos >= cols, rows_pos < seq),
            rows_pos - cols <= window)
        mask = _group_mask(mask, group)
        p = jnp.exp2(jnp.where(mask, s2, DEFAULT_MASK_VALUE)
                     - lse * LOG2E)
        p = jnp.where(mask, p, 0.0)
        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )                                          # [sh, D]
        dp = jax.lax.dot_general(
            do, vv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = (p * (dp - di) * scale).astype(qq.dtype)
        dk = jax.lax.dot_general(
            ds, qq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        dk_ref[0, 0, cs:cs + sh] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0, cs:cs + sh] = dv.astype(dv_ref.dtype)


def _maybe_window_bwd(q, k, v, o, lse, do, *, causal, scale, window,
                      dlse, interpret):
    """Dispatch the backward to the banded-strip window kernels when
    the shape qualifies (mirrors flash.py::_maybe_window_fwd's gate);
    returns None to fall through to the generic schedule.
    AULE_FLASH_WIN_BWD=0 disables."""
    import os as _os
    if _os.environ.get("AULE_FLASH_WIN_BWD", "1") in ("0", "false"):
        return None
    batch, hq, seq_q, d = q.shape
    hkv, seq_k = k.shape[1], k.shape[2]
    group = hq // hkv
    if not (causal and window > 0 and window < seq_k
            and seq_q == seq_k and d % NUM_LANES == 0
            and q.dtype != jnp.float16):
        return None
    d_scale = max(1, d // 128)
    rows_budget = 2048 // d_scale
    if jnp.dtype(q.dtype).itemsize >= 4:
        rows_budget //= 2
    bq = max(NUM_LANES, (rows_budget // group) // NUM_LANES * NUM_LANES)
    bq = min(bq, seq_q)
    while bq > NUM_LANES and (seq_q % bq or bq % NUM_LANES
                              or _cdiv(window, bq) + 1 > seq_k // bq):
        bq //= 2
    if (bq < NUM_LANES or seq_q % bq or bq % NUM_LANES
            or _cdiv(window, bq) + 1 > seq_k // bq):
        return None
    strips = int(_os.environ.get("AULE_FLASH_WIN_BWD_STRIPS", "4"))
    # strip transients are [group*(W+sh+128), sh]-ish f32 several times
    # over (s2, p, dp, ds): cap the worst one at ~1.5 MiB
    while (strips < bq // 8
           and group * (bq // strips)
           * min(window + bq // strips + NUM_LANES,
                 (_cdiv(window, bq) + 1) * bq) * 4 > (3 << 19)):
        strips *= 2
    while strips > 1 and (bq % strips or (bq // strips) % 8):
        strips //= 2

    n_q = seq_q // bq
    n_pre = _cdiv(window, bq)
    n_in = n_pre + 1
    grid = (batch, hkv, n_q)

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    if dlse is not None:
        di = di - dlse.astype(jnp.float32)
    lse_l = jnp.broadcast_to(lse[..., None],
                             lse.shape + (NUM_LANES,)).astype(jnp.float32)
    di_l = jnp.broadcast_to(di[..., None], di.shape + (NUM_LANES,))

    def q_spec(width):
        return pl.BlockSpec((1, group, bq, width),
                            lambda b, hk, i: (b, hk, i, 0))

    def kv_pre(c):  # band chunk c = kv block i - n_pre + c
        return lambda b, hk, i, c=c: (
            b, hk, jnp.maximum(i - n_pre + c, 0), 0)

    dq = pl.pallas_call(
        functools.partial(
            _win_dq_kernel, scale=float(scale), window=window,
            group=group, block_q=bq, n_pre=n_pre, strips=strips,
        ),
        grid=grid,
        in_specs=(
            [q_spec(d)]
            + [pl.BlockSpec((1, 1, bq, d), kv_pre(c))
               for c in range(n_in)] * 2
            + [q_spec(d), q_spec(NUM_LANES), q_spec(NUM_LANES)]
        ),
        out_specs=q_spec(d),
        out_shape=jax.ShapeDtypeStruct((batch, hq, seq_q, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, *([k] * n_in), *([v] * n_in), do, lse_l, di_l)

    # dKV: the transposed band — q/do/lse/di chunks j .. j+n_post
    n_post = n_pre
    n_in2 = n_post + 1

    def q_band(c):
        return lambda b, hk, j, c=c: (
            b, hk, jnp.minimum(j + c, n_q - 1), 0)

    def q_band_spec(width, c):
        return pl.BlockSpec((1, group, bq, width), q_band(c))

    dk, dv = pl.pallas_call(
        functools.partial(
            _win_dkv_kernel, scale=float(scale), window=window,
            group=group, block_q=bq, n_post=n_post, strips=strips,
            seq=seq_q,
        ),
        grid=grid,
        in_specs=(
            [q_band_spec(d, c) for c in range(n_in2)]
            + [pl.BlockSpec((1, 1, bq, d),
                            lambda b, hk, j: (b, hk, j, 0))] * 2
            + [q_band_spec(d, c) for c in range(n_in2)]
            + [q_band_spec(NUM_LANES, c) for c in range(n_in2)]
            + [q_band_spec(NUM_LANES, c) for c in range(n_in2)]
        ),
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b, hk, j: (b, hk, j, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda b, hk, j: (b, hk, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, hkv, seq_k, d), k.dtype),
            jax.ShapeDtypeStruct((batch, hkv, seq_k, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(*([q] * n_in2), k, v, *([do] * n_in2),
      *([lse_l] * n_in2), *([di_l] * n_in2))
    return dq, dk, dv


def _bwd_impl(q, k, v, o, lse, do, *, causal, scale, window,
              dlse=None, interpret=None):
    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu")
    if window > 0:
        win = _maybe_window_bwd(
            q, k, v, o, lse, do, causal=causal, scale=scale,
            window=window, dlse=dlse, interpret=interpret)
        if win is not None:
            return win
    grad_cast = None
    if q.dtype == jnp.float16:
        # Mirror the forward's f16 guard (flash.py:427-432): Mosaic has
        # no f16 vector type on TPU, so compute the backward in f32 and
        # cast the grads back to the caller's dtype.
        grad_cast = jnp.float16
        q, k, v, o, do = (x.astype(jnp.float32)
                          for x in (q, k, v, o, do))
    batch, hq, seq_q, d = q.shape
    hkv, seq_k = k.shape[1], k.shape[2]
    group = hq // hkv

    tiles = get_tile_config(head_dim=d, seq=seq_k, causal=causal)
    # tile table rows are a TOTAL q-row budget per grid step; per-head
    # blocks shrink with the GQA group (see flash.py._pick_blocks), and
    # D>128 scales every VMEM tile by D/128 (see _pick_blocks)
    d_scale = max(1, d // 128)
    bq = max(8, _round_up(tiles.block_q_dq // (group * d_scale), 8))
    bq = min(bq, _round_up(seq_q, 8))
    bkv = min(tiles.block_kv_dkv // d_scale, _round_up(seq_k, 128))
    # sweep knob for the dKV kv-tile width (the dKV diagonal-waste lever
    # is a NARROWER kv tile — p comes from the saved lse, so there is no
    # per-chunk softmax chain to collapse; see probe_bwd_sweep)
    import os as _os_bkv
    if _os_bkv.environ.get("AULE_BWD_BKV"):
        bkv = min(int(_os_bkv.environ["AULE_BWD_BKV"]),
                  _round_up(seq_k, 128))

    sq_pad = _round_up(seq_q, bq)
    sk_pad = _round_up(seq_k, bkv)
    q_ragged = sq_pad != seq_q
    k_ragged = sk_pad != seq_k

    # dQ diagonal-strip layout (mirrors the forward, flash.py): group=1
    # q blocks aligned to the kv tile make the diagonal a block-aligned
    # triangle the kernel strip-decomposes.  dKV keeps the grouped
    # layout: its GQA rows ride the CONTRACTION dim, so splitting the
    # group would race the accumulating output block.
    from ..config import flash_diag, flash_diag_strips
    dq_group, dq_bq, dq_bkv, dq_strips = group, bq, bkv, 0
    diag_bq = min(tiles.block_q_dq // d_scale, 1024)
    rule_strips = (tiles.diag_strips if tiles.diag_strips is not None
                   else 2)
    if (causal and window <= 0 and seq_q == seq_k
            and seq_q % diag_bq == 0 and diag_bq >= 32
            and flash_diag() and rule_strips > 0):
        dq_strips = flash_diag_strips(rule_strips)
        if (diag_bq % dq_strips == 0 and diag_bq // dq_strips >= 8
                and not q_ragged and not k_ragged
                and seq_q % diag_bq == 0):
            dq_group, dq_bq, dq_bkv = 1, diag_bq, diag_bq
        else:
            dq_strips = 0

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    if dlse is not None:
        # lse cotangent folds into delta: ds = p*(dp - di) picks up
        # + p*dlse because d lse / d s = p, i.e. di -> di - dlse
        di = di - dlse.astype(jnp.float32)

    def pad_seq(x, target, axis=2):
        pad = target - x.shape[axis]
        if pad == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    qp = pad_seq(q, sq_pad)
    dop = pad_seq(do, sq_pad)
    # lane-replicate per-row stats to the 128-lane layout Mosaic requires
    lsep = jnp.broadcast_to(pad_seq(lse, sq_pad)[..., None],
                            (batch, hq, sq_pad, NUM_LANES))
    dip = jnp.broadcast_to(pad_seq(di, sq_pad)[..., None],
                           (batch, hq, sq_pad, NUM_LANES))
    kp = pad_seq(k, sk_pad)
    vp = pad_seq(v, sk_pad)

    n_q = sq_pad // bq
    n_kv = sk_pad // bkv

    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu"
        )

    rows = group * bq

    # ---- dQ kernel: grid (B, Hq//dq_group, n_q, n_kv) ----
    dq_n_q = sq_pad // dq_bq
    dq_n_kv = sk_pad // dq_bkv

    # Banded window walk (r4): with a sliding window only a band of
    # ceil((bq+W)/bkv)+1 kv blocks is live per q block; walking the full
    # kv axis made windowed training pay causal-schedule time (24 TF/s
    # effective at W=256/S=4096, BENCH_GRID r4).  The grid's last axis
    # shrinks to the band; index maps and kernels add the band offset.
    dq_band = dq_n_kv
    if window > 0:
        span_kv = dq_bq + (window if causal else 2 * window)
        dq_band = min(dq_n_kv, _cdiv(span_kv, dq_bkv) + 1)
    dq_banded = dq_band < dq_n_kv

    def kv_index(b, hk, i, j):
        lo, hi = _kv_live_range(
            i, block_q=dq_bq, block_kv=dq_bkv, causal=causal,
            window=window, seq_k=seq_k, n_kv=dq_n_kv,
        )
        if dq_banded:
            j = lo + j
        return (b, (hk * dq_group) // group, jnp.clip(j, lo, hi), 0)

    def q_spec(width):
        return pl.BlockSpec((1, dq_group, dq_bq, width),
                            lambda b, hk, i, j: (b, hk, i, 0))

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, causal=causal, window=window,
            group=dq_group, block_q=dq_bq, block_kv=dq_bkv,
            seq_q=seq_q, seq_k=seq_k, n_kv=dq_band,
            q_ragged=q_ragged, k_ragged=k_ragged, diag_strips=dq_strips,
            banded=dq_banded, kv_blocks=dq_n_kv,
        ),
        grid=(batch, hq // dq_group, dq_n_q, dq_band),
        in_specs=[
            q_spec(d),
            pl.BlockSpec((1, 1, dq_bkv, d), kv_index),
            pl.BlockSpec((1, 1, dq_bkv, d), kv_index),
            q_spec(d),
            q_spec(NUM_LANES),
            q_spec(NUM_LANES),
        ],
        out_specs=q_spec(d),
        out_shape=jax.ShapeDtypeStruct((batch, hq, sq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((dq_group * dq_bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, dip)

    # ---- dKV kernel: grid (B, Hkv, n_kv, n_q); the group's rows ride
    # the matmul CONTRACTION dim, so there is no group grid dim ----
    dkv_band = n_q
    if window > 0:
        span_q = bkv + (window if causal else 2 * window)
        dkv_band = min(n_q, _cdiv(span_q, bq) + 1)
    dkv_banded = dkv_band < n_q

    def q_index(width):
        def index(b, hk, j, qi):
            lo, hi = _q_live_range(
                j, block_q=bq, block_kv=bkv, causal=causal, window=window,
                seq_q=seq_q, n_q=n_q,
            )
            if dkv_banded:
                qi = lo + qi
            return (b, hk, jnp.clip(qi, lo, hi), 0)
        return pl.BlockSpec((1, group, bq, width), index)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, causal=causal, window=window,
            group=group, block_q=bq, block_kv=bkv,
            seq_q=seq_q, seq_k=seq_k, n_q=dkv_band,
            q_ragged=q_ragged, k_ragged=k_ragged,
            banded=dkv_banded, q_blocks=n_q,
        ),
        grid=(batch, hkv, n_kv, dkv_band),
        in_specs=[
            q_index(d),
            pl.BlockSpec((1, 1, bkv, d),
                         lambda b, hk, j, qi: (b, hk, j, 0)),
            pl.BlockSpec((1, 1, bkv, d),
                         lambda b, hk, j, qi: (b, hk, j, 0)),
            q_index(d),
            q_index(NUM_LANES),
            q_index(NUM_LANES),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bkv, d),
                         lambda b, hk, j, qi: (b, hk, j, 0)),
            pl.BlockSpec((1, 1, bkv, d),
                         lambda b, hk, j, qi: (b, hk, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, hkv, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((batch, hkv, sk_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, dip)

    dq, dk, dv = dq[:, :, :seq_q], dk[:, :, :seq_k], dv[:, :, :seq_k]
    if grad_cast is not None:
        dq, dk, dv = (x.astype(grad_cast) for x in (dq, dk, dv))
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core(q, k, v, causal: bool, scale: float, window: int):
    # primal (inference) path: skip the LSE write — one full HBM pass
    return flash_attention_fwd(
        q, k, v, causal=causal, scale=scale, window_size=window,
        return_lse=False,
    )


def _flash_core_fwd(q, k, v, causal, scale, window):
    out, lse = flash_attention_fwd(
        q, k, v, causal=causal, scale=scale, window_size=window,
    )
    return out, (q, k, v, out, lse)


def _flash_core_bwd(causal, scale, window, residuals, do):
    q, k, v, o, lse = residuals
    dq, dk, dv = _bwd_impl(
        q, k, v, o, lse, do, causal=causal, scale=scale, window=window,
    )
    return dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_core_lse(q, k, v, causal: bool, scale: float, window: int):
    return flash_attention_fwd(
        q, k, v, causal=causal, scale=scale, window_size=window,
    )


def _flash_core_lse_fwd(q, k, v, causal, scale, window):
    out, lse = flash_attention_fwd(
        q, k, v, causal=causal, scale=scale, window_size=window,
    )
    return (out, lse), (q, k, v, out, lse)


def _flash_core_lse_bwd(causal, scale, window, residuals, cts):
    q, k, v, o, lse = residuals
    do, dlse = cts
    dq, dk, dv = _bwd_impl(
        q, k, v, o, lse, do, causal=causal, scale=scale, window=window,
        dlse=dlse,
    )
    return dq, dk, dv


_flash_core_lse.defvjp(_flash_core_lse_fwd, _flash_core_lse_bwd)


def flash_attention_lse(
    q, k, v,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
):
    """Differentiable (out, lse) pair — the training surface the
    reference exposes as forward-with-LSE + raw backward
    (/root/reference/python/aule/vulkan.py:824-962, src/lib.zig:639-852).
    The lse cotangent is honored (folded into the delta term), which is
    what the cross-shard softmax combine differentiates through
    (parallel/sharded.py)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    window = int(window_size) if window_size and window_size > 0 else -1
    return _flash_core_lse(q, k, v, bool(causal), float(scale), window)


def flash_attention_vjp(
    q, k, v,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
    rope_cos=None,
    rope_sin=None,
):
    """Differentiable pallas flash attention; RoPE applied outside the core
    op (linear, so autodiff gives exact grads through the rotation)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    window = int(window_size) if window_size and window_size > 0 else -1
    if rope_cos is not None:
        from .rope import apply_rope

        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
    return _flash_core(q, k, v, bool(causal), float(scale), window)
