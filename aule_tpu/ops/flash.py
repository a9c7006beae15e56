"""FlashAttention-2 forward Pallas kernel (Mosaic-TPU).

TPU-native re-design of the reference's forward kernels (the Triton FA-2
kernel python/aule/triton_flash.py:62-235 and the GLSL "fast" shader
shaders/attention_f32_fast.comp): online softmax with running (m, l) and an
unnormalized accumulator, GQA head mapping, causal and sliding-window masks
with *block-level skipping*, fused half-split RoPE on Q and K, NaN-safe
fully-masked rows, and an LSE output for training.

TPU mapping decisions (vs the reference's GPU design):
  * grid = (batch, kv_heads, q_blocks, kv_blocks): one grid step processes
    the WHOLE GQA head group (group * block_q query rows, flattened onto
    sublanes) against a single K/V tile residency, so K/V HBM traffic is
    `group`x lower than the reference's per-q-head mapping
    (triton_flash.py:96-101 re-reads K/V per q head).  The kv dim is the
    online-softmax reduction ("arbitrary"), the rest are "parallel".
  * Block skipping is done twice: compute is skipped with @pl.when, and the
    K/V *DMA* is skipped by clamping the kv index map into the live range
    for the current q block — Pallas elides a DMA when the block index
    repeats, so masked-out tiles cost neither FLOPs nor bandwidth (the
    analog of attention_f32_fast.comp:119-155's first/last_kv_block calc).
  * Two-level kv blocking: the DMA tile (block_kv) is walked in
    block_kv_compute sub-chunks so the f32 score tile stays small while
    DMAs stay large.
  * Softmax stats live in VMEM scratch replicated over 128 lanes; matmuls
    accumulate in f32 via preferred_element_type regardless of input dtype.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import get_config, get_tile_config

NUM_LANES = 128
DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
LOG2E = 1.4426950408889634

# test/debug visibility: the resolved layout of the last flash_attention_fwd
# trace (bq, bkv, bkvc, group, diag_strips)
LAST_LAYOUT = {}


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _kv_live_range(i, *, block_q, block_kv, causal, window, seq_k, n_kv):
    """Block-index interval [lo, hi] of kv blocks q-block `i` can see.

    Implements the reference's block-skip algebra
    (attention_f32_fast.comp:119-155 / triton_flash.py:134-152) at tile
    granularity.  Returns traced int32 scalars usable in index maps.
    """
    q_lo = i * block_q
    q_hi = (i + 1) * block_q - 1  # inclusive last q row of the block
    if causal:
        k_max = q_hi  # inclusive
        k_min = jnp.maximum(0, q_lo - window) if window > 0 else 0
    else:
        k_max = seq_k - 1
        k_min = 0
        if window > 0:
            k_min = jnp.maximum(0, q_lo - window)
            k_max = jnp.minimum(seq_k - 1, q_hi + window)
    lo = k_min // block_kv if window > 0 or causal else 0
    hi = k_max // block_kv
    lo = jnp.clip(lo, 0, n_kv - 1)
    hi = jnp.clip(hi, 0, n_kv - 1)
    return lo, hi


def _apply_rope_tile(x, cos, sin):
    """Half-split rotation of a [rows, D] tile with [rows, D/2] tables."""
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def _fwd_kernel(
    # refs (rope tables present only when use_rope)
    *refs,
    scale: float,
    causal: bool,
    window: int,
    group: int,
    block_q: int,
    block_kv: int,
    block_kv_compute: int,
    seq_q: int,
    seq_k: int,
    n_kv: int,
    use_rope: bool,
    return_lse: bool,
    ragged: bool,
    dynamic_kv_len: bool,
    diag_strips: int,
    diag_pair: bool,
    pipeline: bool,
):
    refs = list(refs)
    if use_rope:
        (q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref
         ) = refs[:7]
        rest = refs[7:]
    else:
        (q_ref, k_ref, v_ref) = refs[:3]
        rest = refs[3:]
    kvl_ref = rest.pop(0) if dynamic_kv_len else None
    o_ref = rest.pop(0)
    lse_ref = rest.pop(0) if return_lse else None
    if pipeline:
        (m_scr, l_scr, acc_scr, s_scr) = rest
    else:
        (m_scr, l_scr, acc_scr) = rest
        s_scr = None

    i = pl.program_id(2)
    j = pl.program_id(3)
    rows = group * block_q  # flattened (head-in-group, q-position) rows
    # effective kv length: static seq_k, or the traced SMEM scalar for
    # bucket-padded varlen calls (the HF generate path pads kv to a
    # 128-token bucket so decode steps share one compiled kernel)
    kv_limit = kvl_ref[0] if dynamic_kv_len else seq_k

    @pl.when(j == 0)
    def _init():
        # stats live on lane 0 only (1-lane softmax arithmetic below);
        # lanes 1..127 of m/l are never read, so init just the slice
        m_scr[:, :1] = jnp.full((m_scr.shape[0], 1), DEFAULT_MASK_VALUE,
                                m_scr.dtype)
        l_scr[:, :1] = jnp.zeros((l_scr.shape[0], 1), l_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # f32 inputs need the multi-pass f32 MXU path for reference-grade
    # accuracy (README.md:278-281: <1e-6 vs SDPA); bf16 uses the native
    # single-pass MXU.
    mxu_precision = (jax.lax.Precision.HIGHEST
                     if q_ref.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    # Two-level blocking: the grid/DMA tile is block_kv wide; compute
    # walks it in block_kv_compute sub-chunks (an in-kernel loop costs
    # far less than a grid step, so DMA tiles can grow without growing
    # the f32 score tile).  Skip/interior/edge tiers are decided at
    # sub-chunk granularity.
    n_sub = block_kv // block_kv_compute
    bkvc = block_kv_compute
    maskless_everywhere = (not causal and window <= 0
                           and seq_k % bkvc == 0 and not dynamic_kv_len)
    # perf-diagnosis knob: run edge chunks through the maskless body
    # (WRONG numerics; isolates mask-VPU cost from tier predication cost)
    import os as _os
    force_clean = _os.environ.get("AULE_FLASH_DEBUG_FORCE_CLEAN") == "1"
    single_body = (_os.environ.get("AULE_FLASH_BODY", "tier") == "single"
                   and not maskless_everywhere)

    def _tier_conds(kvo: int, width: int):
        """(live, interior) for the sub-chunk at static in-block offset kvo.

        live = some (row, col) of this q-block x sub-chunk survives the
        bounds/causal/window masks; interior = ALL survive (maskless tier).
        Tile-granular form of the reference's block-skip algebra
        (attention_f32_fast.comp:119-155).
        """
        p0 = j * block_kv + kvo          # first kv position (traced)
        p1 = p0 + width - 1              # last kv position
        q_lo = i * block_q
        q_hi = (i + 1) * block_q - 1
        # bounds terms are vacuous when seq_k fills its padded tiles
        true = jnp.full((), True)
        live = (p0 < kv_limit) if ragged else true
        interior = (p1 < kv_limit) if ragged else true
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

    def _position_mask_w(col0: int, width: int):
        """[block_q, width] mask from q/k positions (shared by the group).

        col0 is the static in-(grid)-block column offset; absolute kv
        position of column c is j*block_kv + col0 + c.
        """
        shape = (block_q, width)
        rows_pos = jax.lax.broadcasted_iota(
            jnp.int32, shape, 0) + i * block_q
        cols = (jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                + j * block_kv + col0)
        terms = []
        if ragged:
            terms.append(cols < kv_limit)
        if causal:
            terms.append(rows_pos >= cols)
        if window > 0:
            terms.append(rows_pos - cols <= window)
            if not causal:
                terms.append(cols - rows_pos <= window)
        mask = terms[0] if terms else jnp.full(shape, True)
        for t in terms[1:]:
            mask = jnp.logical_and(mask, t)
        return mask

    def _score(kvo: int, width: int):
        # softmax scale and the exp->exp2 conversion fold into the q tile
        # HERE (once per q-block residency, amortized over every kv
        # chunk): scaling q in a wrapper pass costs a full read+write of
        # q in HBM (~7% of kernel time at B4/S4096, seen in xprof)
        q = (q_ref[0].reshape(rows, q_ref.shape[-1]).astype(jnp.float32)
             * (scale * LOG2E)).astype(q_ref.dtype)  # [rows, D]
        k = k_ref[0, 0, kvo:kvo + width]  # [width, D]
        if use_rope:
            cosq = jnp.broadcast_to(
                cosq_ref[...][None], (group,) + cosq_ref.shape
            ).reshape(rows, cosq_ref.shape[-1])
            sinq = jnp.broadcast_to(
                sinq_ref[...][None], (group,) + sinq_ref.shape
            ).reshape(rows, sinq_ref.shape[-1])
            q = _apply_rope_tile(
                q.astype(jnp.float32), cosq, sinq
            ).astype(q_ref.dtype)
            k = _apply_rope_tile(
                k.astype(jnp.float32), cosk_ref[kvo:kvo + width],
                sink_ref[kvo:kvo + width],
            ).astype(k_ref.dtype)
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )  # [rows, width] f32, log2-units (scale*log2e folded into the
        #    q tile above; exp2 below — the reference's fast-softmax
        #    trick, triton_flash_amd.py:207-213)

    def _softmax_update(masked: bool, s, kvo: int, width: int):
        if masked:
            # element-level mask: bounds + causal + window; positions are
            # identical for every head in the group, so build it once at
            # [block_q, width] and replicate over the group's sublane rows.
            mask_pos = _position_mask_w(kvo, width)
            mask = jnp.broadcast_to(
                mask_pos[None], (group,) + mask_pos.shape
            ).reshape(rows, width)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        # stats arithmetic runs on 1-lane [rows, 1] slices: the scratch
        # keeps a 128-lane layout (Mosaic tiling), but operating on the
        # full width costs ~4 x rows x 128 VPU ops per chunk (~15% of the
        # interior budget) for values that are identical in every lane
        m_prev = m_scr[:, :1]  # [rows, 1]
        l_prev = l_scr[:, :1]
        m_curr = jnp.max(s, axis=1)[:, None]  # [rows, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)

        p = jnp.exp2(s - m_next)
        if masked and window > 0:
            # NaN safety for fully-masked rows (triton_flash.py:201-220):
            # only windows can empty a row; exp(mask - mask) would be 1.
            p = jnp.where(mask, p, 0.0)

        l_next = l_prev * alpha + jnp.sum(
            p, axis=1, keepdims=True, dtype=jnp.float32)
        m_scr[:, :1] = m_next
        l_scr[:, :1] = l_next

        v = v_ref[0, 0, kvo:kvo + width]
        o_curr = jax.lax.dot_general(
            p.astype(v_ref.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )
        acc_scr[...] = acc_scr[...] * alpha + o_curr

    def _body(masked: bool, kvo: int, width: int):
        _softmax_update(masked, _score(kvo, width), kvo, width)

    def _diag_body(kvo: int):
        """Block-aligned diagonal chunk as static row-strips.

        Preconditions (enforced by the wrapper's diag_mode gate): group==1,
        block_q == block_kv_compute, self-attention, chunk start == q-block
        start.  The [bq, bkvc] diagonal tile is exactly lower-triangular;
        strip t (rows [t*sh, (t+1)*sh)) only attends cols [0, (t+1)*sh), so
        computing per-strip rectangles does 0.5 + 0.5/n_strips of the tile's
        MXU work instead of 1.0 — the structural fix for the ~25% causal
        diagonal waste at S=4k (BENCH_GRID r2).  All offsets are STATIC
        (dynamic in-kernel offsets measured -10..-40%, and per-chunk
        @pl.when body count is poison at -4.6x; this is ONE region with a
        static unrolled loop inside).
        """
        sh = block_q // diag_strips
        for t in range(diag_strips):
            rs = t * sh
            width = rs + sh
            q_t = (q_ref[0, 0, rs:rs + sh].astype(jnp.float32)
                   * (scale * LOG2E)).astype(q_ref.dtype)  # [sh, D]
            k_t = k_ref[0, 0, kvo:kvo + width]              # [width, D]
            if use_rope:
                q_t = _apply_rope_tile(
                    q_t.astype(jnp.float32),
                    cosq_ref[rs:rs + sh], sinq_ref[rs:rs + sh],
                ).astype(q_ref.dtype)
                k_t = _apply_rope_tile(
                    k_t.astype(jnp.float32),
                    cosk_ref[kvo:kvo + width], sink_ref[kvo:kvo + width],
                ).astype(k_ref.dtype)
            s = jax.lax.dot_general(
                q_t, k_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_precision,
            )  # [sh, width]
            # only the trailing [sh, sh] sub-square is triangular, but one
            # whole-strip compare is cheaper than a second region
            rows_pos = jax.lax.broadcasted_iota(
                jnp.int32, (sh, width), 0) + i * block_q + rs
            cols = (jax.lax.broadcasted_iota(jnp.int32, (sh, width), 1)
                    + j * block_kv + kvo)
            s = jnp.where(rows_pos >= cols, s, DEFAULT_MASK_VALUE)

            m_prev = m_scr[rs:rs + sh, :1]
            l_prev = l_scr[rs:rs + sh, :1]
            m_curr = jnp.max(s, axis=1)[:, None]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next)
            l_scr[rs:rs + sh, :1] = l_prev * alpha + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32)
            m_scr[rs:rs + sh, :1] = m_next
            v_t = v_ref[0, 0, kvo:kvo + width]
            o_curr = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_precision,
            )
            acc_scr[rs:rs + sh] = acc_scr[rs:rs + sh] * alpha + o_curr

    if pipeline:
        # Software pipeline: issue chunk c+1's score matmul (MXU) into a
        # double-buffered VMEM scratch before chunk c's softmax (VPU) so
        # the units overlap across chunks.
        conds = [(c * bkvc,) + _tier_conds(c * bkvc, bkvc)
                 for c in range(n_sub)]

        @pl.when(conds[0][1])
        def _mm_first():
            s_scr[0] = _score(conds[0][0], bkvc)

        for c in range(n_sub):
            kvo, live, interior = conds[c]
            if c + 1 < n_sub:
                kvo1, live1, _ = conds[c + 1]

                @pl.when(live1)
                def _mm_next(kvo1=kvo1, c=c):
                    s_scr[(c + 1) % 2] = _score(kvo1, bkvc)

            @pl.when(interior)
            def _interior(c=c, kvo=kvo):
                _softmax_update(False, s_scr[c % 2], kvo, bkvc)

            @pl.when(jnp.logical_and(live, jnp.logical_not(interior)))
            def _edge(c=c, kvo=kvo):
                _softmax_update(not force_clean, s_scr[c % 2], kvo, bkvc)
    elif single_body:
        # One always-masked body per chunk (half the conditional regions
        # of the interior/edge tier walk; Mosaic cost scales with body
        # COUNT, not branch-taken frequency — the 9-body edge experiment
        # measured 4.6x slower uniformly).  Trades ~3.5% mask VPU on
        # interior chunks for the region overhead.
        for c in range(n_sub):
            kvo = c * bkvc
            live, _ = _tier_conds(kvo, bkvc)

            @pl.when(live)
            def _one(kvo=kvo):
                _body(not force_clean, kvo, bkvc)
    elif diag_strips > 0:
        # aligned causal self-attention: chunks are interior (maskless),
        # the block-aligned triangular diagonal (strip-decomposed), or
        # dead — still two @pl.when regions per chunk.
        pair = diag_pair and n_sub % 2 == 0
        if pair:
            # run adjacent interior chunks as ONE 2*bkvc-wide body (the
            # maskless chunk rate peaks at c2048: 154 vs 145 TF/s) at
            # the cost of one extra region per chunk pair
            for c in range(0, n_sub, 2):
                kvo = c * bkvc
                _, int2 = _tier_conds(kvo, 2 * bkvc)

                @pl.when(int2)
                def _interior2(kvo=kvo):
                    _body(False, kvo, 2 * bkvc)

                for cc in (c, c + 1):
                    kvo1 = cc * bkvc
                    _, int1 = _tier_conds(kvo1, bkvc)

                    @pl.when(jnp.logical_and(int1, jnp.logical_not(int2)))
                    def _interior1(kvo1=kvo1):
                        _body(False, kvo1, bkvc)

                    diag = (j * block_kv + kvo1) == i * block_q
                    @pl.when(diag)
                    def _diag(kvo1=kvo1):
                        _diag_body(kvo1)
        else:
            for c in range(n_sub):
                kvo = c * bkvc
                _, interior = _tier_conds(kvo, bkvc)

                @pl.when(interior)
                def _interior(kvo=kvo):
                    _body(False, kvo, bkvc)

                diag = (j * block_kv + kvo) == i * block_q
                @pl.when(diag)
                def _diag(kvo=kvo):
                    _diag_body(kvo)
    else:
        for c in range(n_sub):
            kvo = c * bkvc
            live, interior = _tier_conds(kvo, bkvc)
            if maskless_everywhere:
                @pl.when(live)
                def _all(kvo=kvo):
                    _body(False, kvo, bkvc)
                continue

            @pl.when(interior)
            def _interior(kvo=kvo):
                _body(False, kvo, bkvc)

            edge_cond = jnp.logical_and(live, jnp.logical_not(interior))
            @pl.when(edge_cond)
            def _edge(kvo=kvo):
                _body(not force_clean, kvo, bkvc)

    @pl.when(j == n_kv - 1)
    def _store():
        d = o_ref.shape[-1]
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(
            o_ref.dtype).reshape(group, block_q, d)
        if return_lse:
            # LSE lane-replicated to 128 (Mosaic block layout requires
            # the trailing dim be 128); the wrapper slices lane 0.
            m = m_scr[:, :1]
            lv = l_scr[:, :1]
            # stats are in log2-units; publish in natural-log units
            lse = jnp.where(
                lv > 0.0,
                (m + jnp.log2(jnp.where(lv > 0.0, lv, 1.0)))
                * 0.6931471805599453,
                DEFAULT_MASK_VALUE)
            lse_ref[0] = jnp.broadcast_to(
                lse, (group * block_q, NUM_LANES)).astype(
                    lse_ref.dtype).reshape(group, block_q, NUM_LANES)


def _win_kernel(
    *refs,
    scale: float,
    window: int,
    group: int,
    block_q: int,
    n_pre: int,
    n_post: int,
    causal: bool,
    seq: int,
    win_strips: int,
    use_rope: bool,
    return_lse: bool,
):
    """Causal sliding-window schedule: single-pass banded strips.

    The generic schedule wastes ~90% of the machine on windows
    (BENCH_GRID r2/r3: 18.5 TFLOP/s effective at W=256/S=4096).  Two
    designs were chip-measured on the way here: walking the whole kv
    axis with compute-skipped dead steps (the r2/r3 shape-tuned path,
    2.7-3.7 ms at B4/S4096/W256) and a live-band kv grid with online
    softmax across n_pre+1 chunk steps (2.6-2.7 ms, insensitive to
    strip count — per-grid-step cost dominated).  This kernel removes
    the kv grid axis entirely:

      * grid = (batch, kv_heads, q_blocks) — every step is fully
        parallel, no "arbitrary" dim, no cross-step state;
      * the q block's whole live band arrives as n_pre+1 SEPARATE kv
        inputs (the diag chunk at block i plus n_pre predecessors;
        index maps clamp below block 0 and the in-kernel mask kills the
        clamped columns via an explicit cols >= 0 term);
      * strip t (q rows rs..rs+sh of every head in the GQA group) sees
        ONE contiguous col span [rs-W, rs+sh) of that band, assembled
        by static slices + concat from the chunk refs, so each strip is
        one [group*sh, w<=W+sh+128] score matmul and — because a strip
        covers its entire live span at once — ONE SINGLE-PASS softmax:
        no running (m, l), no rescale chain, no scratch, and the strip
        writes its o_ref rows directly.  Computing per-strip rectangles
        does ~(W+sh)/(W+1) of the band's work (the analog of
        _diag_body's triangle strips; the reference's block-skip
        algebra, attention_f32_fast.comp:119-155, at sub-tile
        granularity).

    Preconditions (wrapper gate): causal, 0 < W < seq, seq_q == seq_k,
    seq % bq == 0.
    """
    refs = list(refs)
    n_kv_in = n_pre + 1 + n_post
    q_ref = refs[0]
    k_refs = refs[1:1 + n_kv_in]
    v_refs = refs[1 + n_kv_in:1 + 2 * n_kv_in]
    rest = refs[1 + 2 * n_kv_in:]
    if use_rope:
        cosq_ref, sinq_ref = rest[0], rest[1]
        cosk_refs = rest[2:2 + n_kv_in]
        sink_refs = rest[2 + n_kv_in:2 + 2 * n_kv_in]
        rest = rest[2 + 2 * n_kv_in:]
    o_ref = rest.pop(0)
    lse_ref = rest.pop(0) if return_lse else None

    i = pl.program_id(2)
    d = q_ref.shape[-1]
    sh = block_q // win_strips
    band = n_kv_in * block_q  # virtual band: chunks i-n_pre .. i

    mxu_precision = (jax.lax.Precision.HIGHEST
                     if q_ref.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    def gather_cols(chunk_refs, lo: int, hi: int):
        """[hi-lo, D] rows of the virtual band via static slices."""
        parts = []
        for c in range(n_kv_in):
            p0, p1 = max(lo, c * block_q), min(hi, (c + 1) * block_q)
            if p0 < p1:
                parts.append(chunk_refs[c][0, 0, p0 - c * block_q:
                                           p1 - c * block_q])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def gather_rope(tab_refs, lo: int, hi: int):
        parts = []
        for c in range(n_kv_in):
            p0, p1 = max(lo, c * block_q), min(hi, (c + 1) * block_q)
            if p0 < p1:
                parts.append(tab_refs[c][p0 - c * block_q:
                                         p1 - c * block_q])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    for t in range(win_strips):
        rs = t * sh
        # strip t's live cols in band coordinates (row pos rs+x maps to
        # band pos n_pre*bq + rs + x), rounded out to 128-lane groups;
        # bidirectional windows extend the span +W above the diagonal
        # (attention_f32.comp:173-187's half-window form)
        lo = max(0, (n_pre * block_q + rs - window)
                 // NUM_LANES * NUM_LANES)
        hi = min(band, _round_up(
            n_pre * block_q + rs + sh + (0 if causal else window),
            NUM_LANES))
        w = hi - lo
        q = (q_ref[0, :, rs:rs + sh].astype(jnp.float32)
             * (scale * LOG2E)).astype(q_ref.dtype)        # [g, sh, D]
        kk = gather_cols(k_refs, lo, hi)                   # [w, D]
        if use_rope:
            cosq = jnp.broadcast_to(
                cosq_ref[rs:rs + sh][None],
                (group, sh, cosq_ref.shape[-1]))
            sinq = jnp.broadcast_to(
                sinq_ref[rs:rs + sh][None],
                (group, sh, sinq_ref.shape[-1]))
            q = _apply_rope_tile(
                q.astype(jnp.float32), cosq, sinq).astype(q_ref.dtype)
            kk = _apply_rope_tile(
                kk.astype(jnp.float32), gather_rope(cosk_refs, lo, hi),
                gather_rope(sink_refs, lo, hi)).astype(kk.dtype)
        s = jax.lax.dot_general(
            q.reshape(group * sh, d), kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        ).reshape(group, sh, w)
        # causal + window + band-underflow masks (positions are
        # head-invariant: build [sh, w] once, broadcast over the group).
        # cols >= 0 kills the clamped below-block-0 chunks at i < n_pre.
        rows_pos = jax.lax.broadcasted_iota(
            jnp.int32, (sh, w), 0) + i * block_q + rs
        cols = (jax.lax.broadcasted_iota(jnp.int32, (sh, w), 1)
                + (i - n_pre) * block_q + lo)
        mask = jnp.logical_and(cols >= 0, rows_pos - cols <= window)
        if causal:
            mask = jnp.logical_and(mask, rows_pos >= cols)
        else:
            # cols < seq kills the top-clamped chunks (their assumed
            # positions sit past the last block), mirroring cols >= 0
            # for the bottom clamp
            mask = jnp.logical_and(
                mask, jnp.logical_and(cols - rows_pos <= window,
                                      cols < seq))
        s = jnp.where(mask[None], s, DEFAULT_MASK_VALUE)
        # single-pass softmax: the strip sees its ENTIRE live span, so
        # no online (m, l) chain is needed (rows always include their
        # own diagonal position — never fully masked)
        m = jnp.max(s, axis=2, keepdims=True)              # [g, sh, 1]
        p = jnp.exp2(s - m)
        p = jnp.where(mask[None], p, 0.0)
        l = jnp.sum(p, axis=2, keepdims=True, dtype=jnp.float32)
        vv = gather_cols(v_refs, lo, hi)
        o = jax.lax.dot_general(
            p.astype(v_refs[0].dtype).reshape(group * sh, w), vv,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        ).reshape(group, sh, d)
        o_ref[0, :, rs:rs + sh] = (o / l).astype(o_ref.dtype)
        if return_lse:
            lse = (m + jnp.log2(l)) * 0.6931471805599453
            lse_ref[0, :, rs:rs + sh] = jnp.broadcast_to(
                lse, (group, sh, NUM_LANES)).astype(lse_ref.dtype)


def _mono_kernel(
    *refs,
    scale: float,
    hb: int,
    sh: int,
    seq: int,
    use_rope: bool,
    return_lse: bool,
):
    """Static whole-sequence causal schedule ("mono") for S <= 4096.

    The r4 verdict traced the causal MFU gap at production shapes
    (55.7% at B4/S4096, 43.4% at B8/S2048 vs the 74-78% non-causal
    ceiling) to per-grid-step fixed cost: the diagonal-strip schedule
    runs B*Hq*S/bq steps of only ~7 us compute each, so ~3 us of step
    overhead eats 20-30% of the machine.  This kernel removes the q
    and kv grid axes entirely for sequences whose whole [S, D] K/V
    tiles fit VMEM:

      * grid = (batch, Hq/hb) — hb q heads of one GQA group per step,
        every step fully parallel; consecutive steps share the kv head
        so the K/V DMA is elided by block-index repetition;
      * the body is a FULLY STATIC unrolled strip loop — no @pl.when,
        no online-softmax chain, no scratch: strip t (q rows
        [t*sh, (t+1)*sh) of all hb heads, flattened onto sublanes)
        sees its ENTIRE causal span [0, rs+sh) in one [hb*sh, rs+sh]
        score matmul, so softmax is single-pass (the _win_kernel trick
        applied to full causal attention);
      * only the [sh, sh] diagonal tail of each strip is masked — the
        strict-past prefix columns are maskless by construction, so
        the mask VPU cost is sh/S of the naive per-element masking;
      * strip over-coverage (cols (row, rs+sh) of the tail) wastes
        sh/S of the causal FLOPs — 3-6% at the tuned sizes, vs the
        grid schedule's per-step overhead of 20-30%.

    Reference analog: the block-skip "fast" shader's first/last-block
    algebra (attention_f32_fast.comp:119-155) collapsed to a static
    schedule; the single-pass strip softmax replaces the online (m,l)
    rescale chain (attention_f32.comp:192-213) outright.
    """
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    rest = refs[3:]
    if use_rope:
        cos_ref, sin_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref = rest.pop(0)
    lse_ref = rest.pop(0) if return_lse else None
    krot_scr = rest.pop(0) if use_rope else None

    d = q_ref.shape[-1]
    n_strips = seq // sh
    rows = hb * sh

    if use_rope:
        # rotate K ONCE per grid step into VMEM scratch (strips re-read
        # slices of it); per-strip rotation would redo O(S^2/sh) work
        krot_scr[...] = _apply_rope_tile(
            k_ref[0, 0].astype(jnp.float32), cos_ref[...], sin_ref[...]
        ).astype(k_ref.dtype)

    def k_span(span):
        return krot_scr[:span] if use_rope else k_ref[0, 0, :span]

    tri = (jax.lax.broadcasted_iota(jnp.int32, (sh, sh), 0)
           >= jax.lax.broadcasted_iota(jnp.int32, (sh, sh), 1))

    for t in range(n_strips):
        rs = t * sh
        span = rs + sh
        q = (q_ref[0, :, rs:rs + sh].astype(jnp.float32)
             * (scale * LOG2E))                       # [hb, sh, D] f32
        if use_rope:
            cos = jnp.broadcast_to(cos_ref[rs:rs + sh][None],
                                   (hb, sh, d // 2))
            sin = jnp.broadcast_to(sin_ref[rs:rs + sh][None],
                                   (hb, sh, d // 2))
            q = _apply_rope_tile(q, cos, sin)
        q = q.astype(q_ref.dtype).reshape(rows, d)
        s = jax.lax.dot_general(
            q, k_span(span), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, span] f32, log2 units
        # mask ONLY the [sh, sh] diagonal tail; prefix cols are all live
        s_tail = s[:, rs:span].reshape(hb, sh, sh)
        s_tail = jnp.where(tri[None], s_tail,
                           DEFAULT_MASK_VALUE).reshape(rows, sh)
        p_dtype = v_ref.dtype
        if rs:
            s_pre = s[:, :rs]
            m = jnp.maximum(jnp.max(s_pre, axis=1),
                            jnp.max(s_tail, axis=1))[:, None]  # [rows, 1]
            p_pre = jnp.exp2(s_pre - m)
            p_tail = jnp.exp2(s_tail - m)
            l = (jnp.sum(p_pre, axis=1, dtype=jnp.float32)
                 + jnp.sum(p_tail, axis=1, dtype=jnp.float32))[:, None]
            o = jax.lax.dot_general(
                p_pre.astype(p_dtype), v_ref[0, 0, :rs],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                p_tail.astype(p_dtype), v_ref[0, 0, rs:span],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m = jnp.max(s_tail, axis=1)[:, None]
            p_tail = jnp.exp2(s_tail - m)
            l = jnp.sum(p_tail, axis=1, dtype=jnp.float32)[:, None]
            o = jax.lax.dot_general(
                p_tail.astype(p_dtype), v_ref[0, 0, :sh],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        # causal rows always include their own diagonal: l >= 1
        o_ref[0, :, rs:rs + sh] = (o / l).astype(o_ref.dtype).reshape(
            hb, sh, d)
        if return_lse:
            lse = (m + jnp.log2(l)) * 0.6931471805599453
            lse_ref[0, :, rs:rs + sh] = jnp.broadcast_to(
                lse.reshape(hb, sh, 1), (hb, sh, NUM_LANES)
            ).astype(lse_ref.dtype)


def _maybe_mono_fwd(q, k, v, *, causal, scale, window, rope_cos,
                    rope_sin, return_lse, kv_len, block_q, block_kv,
                    block_kv_compute, interpret):
    """Dispatch to the static whole-sequence causal schedule
    (_mono_kernel) when the shape qualifies; None falls through.

    Gate: plain causal self-attention, bf16, D=128, S <= 4096 with
    whole-[S,D] K/V tiles fitting the VMEM envelope, no explicit tile
    overrides.  AULE_FLASH_MONO=0 disables; AULE_FLASH_MONO_HB /
    AULE_FLASH_MONO_SH pin the heads-per-step / strip height."""
    import os as _os
    if _os.environ.get("AULE_FLASH_MONO", "1") in ("0", "false"):
        return None
    batch, hq, seq_q, d = q.shape
    hkv, seq_k = k.shape[1], k.shape[2]
    gqa = hq // hkv
    if not (causal and window <= 0 and kv_len is None and seq_q == seq_k
            and block_q is None and block_kv is None
            and block_kv_compute is None and d == 128
            and q.dtype == jnp.bfloat16
            and 1024 <= seq_q <= int(_os.environ.get(
                "AULE_FLASH_MONO_MAX_S", 4096))
            and seq_q % 128 == 0):
        return None

    def budget(hb, sh):
        dbl = 2  # Mosaic double-buffers grid-indexed blocks
        by = hb * seq_q * d * 2 * dbl          # q tile
        by += hb * seq_q * d * 2 * dbl         # out tile
        by += 2 * seq_q * d * 2 * dbl          # k + v tiles
        if return_lse:
            by += hb * seq_q * NUM_LANES * 4 * dbl
        # score f32 + exp2 f32 + p bf16 transients
        by += hb * sh * seq_q * (4 + 4 + 2)
        if rope_cos is not None:
            by += 3 * seq_q * d * 2            # rotated-k + table slack
        return by

    env_hb = _os.environ.get("AULE_FLASH_MONO_HB")
    env_sh = _os.environ.get("AULE_FLASH_MONO_SH")
    if env_hb and env_sh:
        # pinned by the sweep: trust the caller, skip the budget model
        hb, sh = int(env_hb), int(env_sh)
        if seq_q % sh or gqa % hb:
            return None
    else:
        cap = int(_os.environ.get("AULE_FLASH_MONO_CAP", 48 << 20))
        sh = int(env_sh) if env_sh else 128
        if seq_q % sh:
            return None
        # hb (q heads per grid step): the largest GQA-group divisor
        # (<= 8) whose VMEM budget fits.  QUIET-chip sweeps (rep spread
        # < 5%, no concurrent host/chip load — earlier same-day sweeps
        # were contaminated by a busy 1-core host biasing the
        # t(N)-t(1) harness fast) show head batching wins at every
        # measured shape: B4/S4096 hb4 142.9 vs hb1 134.6 TF/s;
        # B8/S2048 hb4 131.3 vs hb1 110.5; B1/S2048 hb4 >> hb1.
        # Fewer grid steps beats pipelining headroom.
        divisors = [h for h in range(1, gqa + 1) if gqa % h == 0]
        if env_hb:
            hb = int(env_hb)
        else:
            hb = max(h for h in divisors if h <= 8)
        while hb > 1 and budget(hb, sh) > cap:
            hb = max(h for h in divisors if h < hb)
        if budget(hb, sh) > cap:
            return None

    use_rope = rope_cos is not None
    half_d = d // 2
    grid = (batch, hq // hb)

    in_specs = [
        pl.BlockSpec((1, hb, seq_q, d), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, seq_k, d),
                     lambda b, h: (b, (h * hb) // gqa, 0, 0)),
        pl.BlockSpec((1, 1, seq_k, d),
                     lambda b, h: (b, (h * hb) // gqa, 0, 0)),
    ]
    args = [q, k, v]
    if use_rope:
        rope_cos = jnp.asarray(rope_cos, jnp.float32)
        rope_sin = jnp.asarray(rope_sin, jnp.float32)
        if rope_cos.shape[0] < seq_q:
            pad = seq_q - rope_cos.shape[0]
            rope_cos = jnp.pad(rope_cos, ((0, pad), (0, 0)),
                               constant_values=1.0)
            rope_sin = jnp.pad(rope_sin, ((0, pad), (0, 0)))
        in_specs += [
            pl.BlockSpec((seq_q, half_d), lambda b, h: (0, 0)),
            pl.BlockSpec((seq_q, half_d), lambda b, h: (0, 0)),
        ]
        args += [rope_cos, rope_sin]

    out_specs = [
        pl.BlockSpec((1, hb, seq_q, d), lambda b, h: (b, h, 0, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct((batch, hq, seq_q, d), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec(
            (1, hb, seq_q, NUM_LANES), lambda b, h: (b, h, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, hq, seq_q, NUM_LANES), jnp.float32))

    scratch_shapes = []
    if use_rope:
        scratch_shapes.append(pltpu.VMEM((seq_k, d), k.dtype))  # rotated K
    kernel = functools.partial(
        _mono_kernel, scale=float(scale), hb=hb, sh=sh, seq=seq_q,
        use_rope=use_rope, return_lse=return_lse,
    )
    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu")
    flops = 2 * batch * hq * seq_q * seq_k * d
    LAST_LAYOUT.update(bq=seq_q, bkv=seq_k, bkvc=sh, group=hb,
                       diag_strips=0, win_strips=0, n_pre=0,
                       mono_hb=hb, mono_sh=sh)
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=int(
                _os.environ.get("AULE_FLASH_MONO_VMEM", 100 << 20)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * hq * seq_q * seq_k // 2,
        ),
        interpret=interpret,
    )(*args)
    out = results[0]
    if not return_lse:
        return out
    return out, results[1][..., 0]


def _pick_blocks(
    seq_q: int,
    seq_k: int,
    group: int,
    itemsize: int,
    window: int,
    block_q: Optional[int],
    block_kv: Optional[int],
    block_kv_compute: Optional[int],
    head_dim: int = 128,
    causal: bool = False,
) -> Tuple[int, int, int]:
    """Resolve (per-head block_q, block_kv DMA tile, compute chunk).

    The tuned tile table is expressed as a TOTAL q-row budget per grid
    step; the per-head block is budget/group so flattened group rows hit
    the same MXU/VMEM envelope regardless of GQA ratio.  f32 tiles carry
    2x bytes plus f32 mask temporaries, so they get a halved budget and a
    clamped DMA tile (chip-validated: bf16 defaults blow scoped VMEM).
    """
    tiles = get_tile_config(head_dim=head_dim, seq=seq_k, causal=causal)
    # D>128 scales every VMEM tile (q, acc, k/v DMA slabs) by D/128:
    # shrink the row budget and the DMA tile to stay in the envelope the
    # D=128 sweep validated (SURVEY quirk list: the reference caps D at
    # 64/128 — attention_gpu.zig:402, README.md:205 — we template up to
    # 256 instead).
    d_scale = max(1, head_dim // 128)
    if block_q is not None:
        bq = block_q
    else:
        rows_budget = tiles.block_q // d_scale
        if itemsize >= 4:
            rows_budget = min(rows_budget, 512)
        if window > 0:
            # window live-span per q block is (bq + W) columns: smaller q
            # blocks turn O(S^2) masked work into O(S*(bq+W)) (the payoff
            # the reference gets from block skipping, python/README.md:38).
            rows_budget = min(rows_budget,
                              max(256, _round_up(window, 8) * 2))
        bq = max(8, _round_up(rows_budget // group, 8))
    bq = min(bq, _round_up(seq_q, 8))

    bkv = block_kv or min(tiles.block_kv // d_scale,
                          _round_up(seq_k, 128))
    bkv = min(bkv, _round_up(seq_k, 128))
    if block_kv is None and itemsize >= 4:
        bkv = min(bkv, _round_up(min(2048, seq_k), 128))

    bkvc = min(block_kv_compute or tiles.block_kv_compute or bkv, bkv)
    if itemsize >= 4 and block_kv_compute is None:
        bkvc = min(bkvc, 512)
    if window > 0 and block_kv_compute is None:
        bkvc = min(bkvc, 512)
    if bkv % bkvc != 0:
        # largest 8-aligned divisor of bkv not exceeding the request
        bkvc = max(c for c in range(8, bkvc + 1, 8) if bkv % c == 0)
    return bq, bkv, bkvc


def _causal_kernel(
    *refs,
    scale: float,
    group: int,
    block_q: int,
    n_sub: int,
    strips: int,
    use_rope: bool,
    return_lse: bool,
):
    """Group-batched causal schedule for short/mid S (the r4 "v3").

    The r3 diagonal-strip schedule flattens NO heads (group=1) so its
    q blocks align with kv chunks — at the cost of Hq× more grid steps
    (B4/S4096: 512 steps; measured per-step overhead ~3 µs dominates at
    S ≤ 4k, BENCH_GRID).  This kernel keeps the alignment with
    group = gqa by batching the GQA group into the SUBLANE dim and
    stripping rows (the _win_kernel trick): every head of the group
    shares the same q-position span, so chunk c of the in-kernel walk
    is interior (c < i), diagonal (c == i) or dead (c > i) for the
    whole [group, bq] block at once, and each strip is one
    [group*sh, width] matmul.  Strips exist to cap the f32 score
    transient, not to skip work on interior chunks; on the diagonal
    chunk they skip the upper triangle exactly like _diag_body.

    Grid = (batch, kv_heads, q_blocks) — the whole prefix rides in ONE
    K/V DMA tile (wrapper gate caps S so it fits VMEM), so there is no
    kv grid axis and no dead grid steps; dead CHUNKS cost one region
    check.  4× fewer steps than the group=1 diag layout at GQA 4.
    """
    refs = list(refs)
    if use_rope:
        (q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref
         ) = refs[:7]
        rest = refs[7:]
    else:
        (q_ref, k_ref, v_ref) = refs[:3]
        rest = refs[3:]
    o_ref = rest.pop(0)
    lse_ref = rest.pop(0) if return_lse else None
    (m_scr, l_scr, acc_scr) = rest

    i = pl.program_id(2)
    d = q_ref.shape[-1]
    sh = block_q // strips

    m_scr[:, :, :1] = jnp.full((group, block_q, 1), DEFAULT_MASK_VALUE,
                               m_scr.dtype)
    l_scr[:, :, :1] = jnp.zeros((group, block_q, 1), l_scr.dtype)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    mxu_precision = (jax.lax.Precision.HIGHEST
                     if q_ref.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    def q_strip(rs: int):
        qs = (q_ref[0, :, rs:rs + sh].astype(jnp.float32)
              * (scale * LOG2E)).astype(q_ref.dtype)      # [g, sh, D]
        if use_rope:
            cosq = jnp.broadcast_to(
                cosq_ref[rs:rs + sh][None],
                (group, sh, cosq_ref.shape[-1]))
            sinq = jnp.broadcast_to(
                sinq_ref[rs:rs + sh][None],
                (group, sh, sinq_ref.shape[-1]))
            qs = _apply_rope_tile(
                qs.astype(jnp.float32), cosq, sinq).astype(q_ref.dtype)
        return qs.reshape(group * sh, d)

    def k_cols(lo: int, hi: int):
        kk = k_ref[0, 0, lo:hi]
        if use_rope:
            kk = _apply_rope_tile(
                kk.astype(jnp.float32), cosk_ref[lo:hi],
                sink_ref[lo:hi]).astype(k_ref.dtype)
        return kk

    def update(rs: int, s, lo: int, hi: int, tri: bool):
        """Online (m, l, acc) update for strip rows [rs, rs+sh) with
        score tile s [g, sh, w] over kv cols [lo, hi)."""
        w = hi - lo
        if tri:
            # diagonal chunk: only the trailing [sh, sh] sub-square is
            # triangular, but one whole-strip compare is cheaper than a
            # second region (same trade as _diag_body).  Coordinates
            # are CHUNK-relative: this chunk IS the q block (c == i),
            # so strip row x sits at in-chunk position rs + x and sees
            # in-chunk cols 0..rs+x.
            rows_pos = jax.lax.broadcasted_iota(
                jnp.int32, (sh, w), 0) + rs
            cols = jax.lax.broadcasted_iota(jnp.int32, (sh, w), 1)
            mask = rows_pos >= cols
            s = jnp.where(mask[None], s, DEFAULT_MASK_VALUE)
        m_prev = m_scr[:, rs:rs + sh, :1]
        l_prev = l_scr[:, rs:rs + sh, :1]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_scr[:, rs:rs + sh, :1] = l_prev * alpha + jnp.sum(
            p, axis=2, keepdims=True, dtype=jnp.float32)
        m_scr[:, rs:rs + sh, :1] = m_next
        vv = v_ref[0, 0, lo:hi]
        o_curr = jax.lax.dot_general(
            p.astype(v_ref.dtype).reshape(group * sh, w), vv,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        ).reshape(group, sh, d)
        acc_scr[:, rs:rs + sh] = acc_scr[:, rs:rs + sh] * alpha + o_curr

    for c in range(n_sub):
        lo = c * block_q

        @pl.when(c < i)
        def _interior(lo=lo):
            kk = k_cols(lo, lo + block_q)
            for t in range(strips):
                rs = t * sh
                s = jax.lax.dot_general(
                    q_strip(rs), kk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu_precision,
                ).reshape(group, sh, block_q)
                update(rs, s, lo, lo + block_q, tri=False)

        @pl.when(c == i)
        def _diag(lo=lo):
            for t in range(strips):
                rs = t * sh
                hi = lo + rs + sh  # strip sees cols [lo, lo+rs+sh)
                kk = k_cols(lo, hi)
                s = jax.lax.dot_general(
                    q_strip(rs), kk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu_precision,
                ).reshape(group, sh, rs + sh)
                update(rs, s, lo, hi, tri=True)

    l = l_scr[:, :, :1]
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
    if return_lse:
        m = m_scr[:, :, :1]
        lse = jnp.where(
            l > 0.0,
            (m + jnp.log2(jnp.where(l > 0.0, l, 1.0)))
            * 0.6931471805599453,
            DEFAULT_MASK_VALUE)
        lse_ref[0] = jnp.broadcast_to(
            lse, (group, block_q, NUM_LANES)).astype(lse_ref.dtype)


def _maybe_causal_fwd(q, k, v, *, causal, scale, window, rope_cos,
                      rope_sin, return_lse, kv_len, block_q, block_kv,
                      block_kv_compute, interpret):
    """Dispatch to the group-batched causal schedule (_causal_kernel)
    when explicitly enabled; None falls through.

    OPT-IN (AULE_FLASH_CAUSAL_V3=1) — chip-measured SLOWER than the
    diagonal-strip schedule and kept as a documented negative result:
    B4/S4096 13.15 vs 5.19 ms (0.39x), B8/S2048 4.04 vs 3.16 (0.78x),
    B8/H12 MHA S1024 0.69x, B2/H16:4 S2048 1.02x (probe_r4_causal3.py,
    2026-08-19).  The "fewer grid steps win" premise failed: with
    group-batched rows the per-chunk online (m,l,acc) updates walk 3-D
    strided scratch slices and re-scale/re-rope the q strip for every
    (chunk, strip) pair, costing more than the grid steps saved.  Kept
    because the layout (group in sublanes + whole-prefix K/V tile) is
    the natural one for a future generation with a bigger VMEM/smaller
    per-step cost, and the probe makes re-evaluating it one env var."""
    import os as _os
    if _os.environ.get("AULE_FLASH_CAUSAL_V3", "0") not in ("1", "true"):
        return None
    batch, hq, seq_q, d = q.shape
    hkv, seq_k = k.shape[1], k.shape[2]
    group = hq // hkv
    if not (causal and window <= 0 and kv_len is None and seq_q == seq_k
            and block_q is None and block_kv is None
            and block_kv_compute is None and d % NUM_LANES == 0):
        return None
    itemsize = jnp.dtype(q.dtype).itemsize
    # VMEM envelope: K+V whole-prefix tiles (2 * S * D * itemsize,
    # double-buffered by Mosaic) + q/acc/m/l rows (~8 MiB at rows=4096).
    # Cap K+V at 2 MiB — S<=4096 bf16 D128; beyond that the r3 diag
    # schedule already reaches 63-75% MFU (overhead amortizes with S)
    # and this schedule's one-DMA-tile premise stops paying.
    if seq_k * d * itemsize * 2 > (2 << 20):
        return None
    d_scale = max(1, d // 128)
    # per-row VMEM ≈ 2.5 KiB·(D/128) (q+out double-buffered bf16, f32
    # acc, f32 m+l); the whole-prefix K/V tiles eat the rest of the
    # ~16 MiB scoped budget (chip-validated: rows=4096 + 2 MiB K/V at
    # S=4096 OOMs at 18.9M).  Halve rows once K/V crosses 1 MiB.
    rows_budget = (4096 if seq_k * d * itemsize * 2 <= (1 << 19)
                   else 2048) // d_scale
    if itemsize >= 4:
        rows_budget //= 2
    bq = max(NUM_LANES, (rows_budget // group) // NUM_LANES * NUM_LANES)
    bq = min(bq, seq_q)
    while bq > NUM_LANES and seq_q % bq:
        bq //= 2
    if seq_q % bq:
        return None
    n_sub = seq_q // bq
    strips = int(_os.environ.get("AULE_FLASH_C3_STRIPS", "4"))
    # cap the f32 score transient [group*sh, bq] at ~1.5 MiB
    while (strips < bq // 8
           and group * (bq // strips) * bq * 4 > (3 << 19)):
        strips *= 2
    while strips > 1 and (bq % strips or (bq // strips) % 8):
        strips //= 2

    use_rope = rope_cos is not None
    half_d = d // 2
    grid = (batch, hkv, n_sub)

    in_specs = [
        pl.BlockSpec((1, group, bq, d), lambda b, hk, i: (b, hk, i, 0)),
        pl.BlockSpec((1, 1, seq_k, d), lambda b, hk, i: (b, hk, 0, 0)),
        pl.BlockSpec((1, 1, seq_k, d), lambda b, hk, i: (b, hk, 0, 0)),
    ]
    args = [q, k, v]
    if use_rope:
        rope_cos = jnp.asarray(rope_cos, jnp.float32)
        rope_sin = jnp.asarray(rope_sin, jnp.float32)
        if rope_cos.shape[0] < seq_q:
            pad = seq_q - rope_cos.shape[0]
            rope_cos = jnp.pad(rope_cos, ((0, pad), (0, 0)),
                               constant_values=1.0)
            rope_sin = jnp.pad(rope_sin, ((0, pad), (0, 0)))
        in_specs += [
            pl.BlockSpec((bq, half_d), lambda b, hk, i: (i, 0)),
            pl.BlockSpec((bq, half_d), lambda b, hk, i: (i, 0)),
            pl.BlockSpec((seq_k, half_d), lambda b, hk, i: (0, 0)),
            pl.BlockSpec((seq_k, half_d), lambda b, hk, i: (0, 0)),
        ]
        args += [rope_cos, rope_sin, rope_cos, rope_sin]

    out_specs = [
        pl.BlockSpec((1, group, bq, d), lambda b, hk, i: (b, hk, i, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct((batch, hq, seq_q, d), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec(
            (1, group, bq, NUM_LANES),
            lambda b, hk, i: (b, hk, i, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, hq, seq_q, NUM_LANES), jnp.float32))

    scratch_shapes = [
        pltpu.VMEM((group, bq, NUM_LANES), jnp.float32),  # m
        pltpu.VMEM((group, bq, NUM_LANES), jnp.float32),  # l
        pltpu.VMEM((group, bq, d), jnp.float32),          # acc
    ]
    kernel = functools.partial(
        _causal_kernel, scale=float(scale), group=group, block_q=bq,
        n_sub=n_sub, strips=strips, use_rope=use_rope,
        return_lse=return_lse,
    )
    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu")
    flops = 2 * batch * hq * seq_q * seq_k * d  # causal: half of 4BHS²D
    LAST_LAYOUT.update(bq=bq, bkv=seq_k, bkvc=bq, group=group,
                       diag_strips=0, win_strips=0, n_pre=0,
                       mono_hb=0, mono_sh=0, c3_strips=strips)
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * hq * seq_q * seq_k // 2,
        ),
        interpret=interpret,
    )(*args)
    out = results[0]
    if not return_lse:
        return out
    return out, results[1][..., 0]


def _maybe_window_fwd(q, k, v, *, causal, scale, window, rope_cos,
                      rope_sin, return_lse, kv_len, block_q, block_kv,
                      block_kv_compute, interpret):
    """Dispatch to the banded window-strip schedule (_win_kernel) when
    the shape qualifies; returns None to fall through to the generic
    schedule.  Gate: sliding window (0 < W < seq), causal OR
    bidirectional (r5: the half-window form of attention_f32.comp:
    173-187 rides the same band with n_post = n_pre extra chunks), on
    aligned self-attention with no explicit tile overrides."""
    import os as _os
    if _os.environ.get("AULE_FLASH_WIN", "1") in ("0", "false"):
        return None
    batch, hq, seq_q, d = q.shape
    hkv, seq_k = k.shape[1], k.shape[2]
    group = hq // hkv
    if not (window > 0 and window < seq_k and kv_len is None
            and seq_q == seq_k and block_q is None and block_kv is None
            and block_kv_compute is None):
        return None

    # Rows budget: unlike the generic path (whose [rows, bkvc] f32
    # score tile pins rows at ~1024), score tiles here are strip-sized
    # [group*sh, <=W+sh], so rows can grow until the q/acc/m/l scratch
    # (~rows * (2 + 4 + 4 + 4) * 128 bytes + 2 kv tiles) nears the
    # ~16 MiB VMEM envelope — fewer, fatter grid steps.
    d_scale = max(1, d // 128)
    rows_budget = 4096 // d_scale
    if jnp.dtype(q.dtype).itemsize >= 4:
        rows_budget //= 2
    if return_lse:
        # the lane-replicated f32 LSE tile adds 4*128 bytes/row
        # (double-buffered): at rows=4096 it pushed the training-path
        # fwd 1.2M over the 16M scoped limit (r5 chip)
        rows_budget //= 2
    bq = max(NUM_LANES, (rows_budget // group) // NUM_LANES * NUM_LANES)
    bq = min(bq, seq_q)
    # the schedule needs a real band: ceil(W/bq)+1 live chunks out of
    # seq/bq total — shrink bq until that holds (or fall back; at that
    # point the window saves nothing over plain causal anyway)
    while bq > NUM_LANES and (seq_q % bq or bq % NUM_LANES
                              or _cdiv(window, bq) + 1 > seq_k // bq):
        bq //= 2
    if (bq < NUM_LANES or seq_q % bq or bq % NUM_LANES or d % NUM_LANES
            or _cdiv(window, bq) + 1 > seq_k // bq):
        return None
    win_strips = int(_os.environ.get("AULE_FLASH_WIN_STRIPS", "4"))
    # a strip's f32 score/probability temporaries are
    # [group*sh, w <= span+sh+128] (span = W causal, 2W bidirectional):
    # cap them at ~1.5 MiB (chip-validated: 4 MiB strip temps fail
    # Mosaic allocation) by raising the strip count until the
    # worst-case width fits
    w_span = window if causal else 2 * window
    n_band = _cdiv(window, bq) + 1 + (0 if causal else _cdiv(window, bq))
    while (win_strips < bq // 8
           and group * (bq // win_strips)
           * min(w_span + bq // win_strips + NUM_LANES,
                 n_band * bq) * 4 > (3 << 19)):
        win_strips *= 2
    while win_strips > 1 and (bq % win_strips or (bq // win_strips) % 8):
        win_strips //= 2
    n_kv = seq_k // bq
    n_pre = _cdiv(window, bq)
    n_post = 0 if causal else n_pre

    use_rope = rope_cos is not None
    half_d = d // 2
    n_q = seq_q // bq
    grid = (batch, hkv, n_q)

    def kv_index(c):  # band chunk c = kv block i - n_pre + c
        return lambda b, hk, i, c=c: (
            b, hk, jnp.clip(i - n_pre + c, 0, n_kv - 1), 0)

    def kv_index_rope(c):
        return lambda b, hk, i, c=c: (
            jnp.clip(i - n_pre + c, 0, n_kv - 1), 0)

    n_in = n_pre + 1 + n_post
    in_specs = [
        pl.BlockSpec((1, group, bq, d), lambda b, hk, i: (b, hk, i, 0)),
    ]
    in_specs += [pl.BlockSpec((1, 1, bq, d), kv_index(c))
                 for c in range(n_in)] * 2
    args = [q] + [k] * n_in + [v] * n_in
    if use_rope:
        rope_cos = jnp.asarray(rope_cos, jnp.float32)
        rope_sin = jnp.asarray(rope_sin, jnp.float32)
        if rope_cos.shape[0] < seq_q:
            pad = seq_q - rope_cos.shape[0]
            rope_cos = jnp.pad(rope_cos, ((0, pad), (0, 0)),
                               constant_values=1.0)
            rope_sin = jnp.pad(rope_sin, ((0, pad), (0, 0)))
        in_specs += [
            pl.BlockSpec((bq, half_d), lambda b, hk, i: (i, 0)),
            pl.BlockSpec((bq, half_d), lambda b, hk, i: (i, 0)),
        ]
        in_specs += [pl.BlockSpec((bq, half_d), kv_index_rope(c))
                     for c in range(n_in)] * 2
        args += ([rope_cos, rope_sin] + [rope_cos] * n_in
                 + [rope_sin] * n_in)

    out_specs = [
        pl.BlockSpec((1, group, bq, d), lambda b, hk, i: (b, hk, i, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct((batch, hq, seq_q, d), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec(
            (1, group, bq, NUM_LANES),
            lambda b, hk, i: (b, hk, i, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, hq, seq_q, NUM_LANES), jnp.float32))

    scratch_shapes = []
    kernel = functools.partial(
        _win_kernel, scale=float(scale), window=window, group=group,
        block_q=bq, n_pre=n_pre, n_post=n_post, causal=causal,
        seq=seq_k, win_strips=win_strips,
        use_rope=use_rope, return_lse=return_lse,
    )
    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu")
    span = (window + 1) if causal else (2 * window + 1)
    flops = 4 * batch * hq * seq_q * min(span, seq_k) * d
    LAST_LAYOUT.update(bq=bq, bkv=bq, bkvc=bq, group=group,
                       diag_strips=0, win_strips=win_strips,
                       n_pre=n_pre, n_post=n_post, mono_hb=0, mono_sh=0)
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # the bidirectional band's extra chunk inputs push the
            # default 16M scoped limit by ~0.3M at rows=4096 (r5)
            vmem_limit_bytes=int(
                _os.environ.get("AULE_FLASH_MONO_VMEM", 100 << 20)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * hq * seq_q * min(span, seq_k),
        ),
        interpret=interpret,
    )(*args)
    out = results[0]
    if not return_lse:
        return out
    return out, results[1][..., 0]


def flash_attention_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    block_kv_compute: Optional[int] = None,
    return_lse: bool = True,
    kv_len: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward flash attention; returns (out [B,Hq,Sq,D], lse [B,Hq,Sq]),
    or just `out` with return_lse=False (inference: skips the lane-
    replicated [B,Hq,Sq,128] f32 LSE write, a full extra HBM pass).

    Accepts unpadded shapes; pads Sq/Sk up to tile multiples internally and
    masks the padding (the reference's bounds masks, triton_flash.py:197-199).

    kv_len: optional TRACED int32 scalar <= seq_k giving the number of
    valid k/v tokens (bucket-padded varlen: callers pad k/v to a shape
    bucket and vary kv_len without recompiling — the mechanism behind the
    HF-generate patch's per-step shape stability; the reference has no
    varlen analog, its Triton path recompiles per shape too).
    """
    batch, hq, seq_q, d = q.shape
    hkv, seq_k = k.shape[1], k.shape[2]
    gqa = hq // hkv
    group = gqa
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    window = int(window_size) if window_size and window_size > 0 else -1

    out_cast = None
    if q.dtype == jnp.float16:
        # Mosaic has no f16 vector type on TPU ("Unsupported type in
        # mosaic dialect: 'f16'"); compute in f32 (the reference's f16
        # shaders also accumulate in f32) and cast the output back.
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
        out_cast = jnp.float16
    # (softmax scale + exp->exp2 fold into the q tile INSIDE the kernel,
    # once per q-block residency — see _score)

    # Banded window-strip specialization (see _win_kernel): live-band kv
    # grid + static strip rectangles.  Taken for plain causal sliding
    # windows on aligned self-attention shapes; everything else falls
    # through to the generic schedule below.
    win_out = _maybe_mono_fwd(
        q, k, v, causal=causal, scale=scale, window=window,
        rope_cos=rope_cos, rope_sin=rope_sin, return_lse=return_lse,
        kv_len=kv_len, block_q=block_q, block_kv=block_kv,
        block_kv_compute=block_kv_compute, interpret=interpret)
    if win_out is None:
        win_out = _maybe_causal_fwd(
            q, k, v, causal=causal, scale=scale, window=window,
            rope_cos=rope_cos, rope_sin=rope_sin, return_lse=return_lse,
            kv_len=kv_len, block_q=block_q, block_kv=block_kv,
            block_kv_compute=block_kv_compute, interpret=interpret)
    if win_out is None:
        win_out = _maybe_window_fwd(
            q, k, v, causal=causal, scale=scale, window=window,
            rope_cos=rope_cos, rope_sin=rope_sin, return_lse=return_lse,
            kv_len=kv_len, block_q=block_q, block_kv=block_kv,
            block_kv_compute=block_kv_compute, interpret=interpret)
    if win_out is not None:
        if out_cast is not None:
            if return_lse:
                return win_out[0].astype(out_cast), win_out[1]
            return win_out.astype(out_cast)
        return win_out

    # Diagonal-strip causal specialization: flatten NO heads (group=1) so
    # the q block's position span equals the kv compute chunk, making the
    # diagonal chunk an exactly block-aligned triangle the kernel can
    # strip-decompose (see _diag_body).  Costs `gqa`x more K/V DMA traffic
    # (~12% of runtime, double-buffered away); removes the bkvc/S
    # diagonal-waste term of the causal MFU model.
    from ..config import flash_diag, flash_diag_strips
    from ..config import flash_diag_pair as _flash_diag_pair
    diag_strips = 0
    tiles = get_tile_config(head_dim=d, seq=seq_k, causal=causal)
    d_scale = max(1, d // 128)
    diag_bq = tiles.block_q // d_scale
    if jnp.dtype(q.dtype).itemsize >= 4:
        diag_bq = min(diag_bq, 512)
    # strip count: tile-rule opinion (diag_strips=0 rules shapes where
    # the generic walk measures faster, e.g. D>=256) under the usual
    # env/config override chain
    rule_strips = (tiles.diag_strips if tiles.diag_strips is not None
                   else 2)
    if (causal and window <= 0 and kv_len is None
            and seq_q == seq_k and seq_q % diag_bq == 0
            and block_q is None and block_kv_compute is None
            and flash_diag()):
        diag_strips = flash_diag_strips(rule_strips)
        group = 1 if diag_strips > 0 else group
        if diag_strips > 0:
            block_q, block_kv_compute = diag_bq, diag_bq

    bq, bkv, bkvc = _pick_blocks(
        seq_q, seq_k, group, jnp.dtype(q.dtype).itemsize, window,
        block_q, block_kv, block_kv_compute, head_dim=d, causal=causal,
    )
    if diag_strips and (bq != bkvc or bkv % bkvc != 0
                        or bq % diag_strips != 0 or bq // diag_strips < 8):
        # alignment lost in block resolution: back to the generic path
        diag_strips = 0
        group = gqa
        bq, bkv, bkvc = _pick_blocks(
            seq_q, seq_k, group, jnp.dtype(q.dtype).itemsize, window,
            None, block_kv, None, head_dim=d, causal=causal,
        )

    sq_pad = _round_up(seq_q, bq)
    sk_pad = _round_up(seq_k, bkv)
    if sq_pad != seq_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - seq_q), (0, 0)))
    if sk_pad != seq_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - seq_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - seq_k), (0, 0)))

    LAST_LAYOUT.update(bq=bq, bkv=bkv, bkvc=bkvc, group=group,
                       diag_strips=diag_strips, win_strips=0, n_pre=0,
                       mono_hb=0, mono_sh=0)
    n_q = sq_pad // bq
    n_kv = sk_pad // bkv
    # head grid axis walks Hq in `group`-sized flattened blocks; the kv
    # head index divides back down to the shared K/V head (identity when
    # group == gqa; h // gqa when the diag path flattens nothing)
    grid = (batch, hq // group, n_q, n_kv)

    use_rope = rope_cos is not None
    half_d = d // 2

    def kv_index(b, hk, i, j):
        lo, hi = _kv_live_range(
            i, block_q=bq, block_kv=bkv, causal=causal, window=window,
            seq_k=seq_k, n_kv=n_kv,
        )
        jc = jnp.clip(j, lo, hi)  # repeated index => DMA elided
        return (b, (hk * group) // gqa, jc, 0)

    def kv_index_rope(b, hk, i, j):
        b_, h_, jc, z = kv_index(b, hk, i, j)
        return (jc, 0)

    in_specs = [
        pl.BlockSpec((1, group, bq, d), lambda b, hk, i, j: (b, hk, i, 0)),
        pl.BlockSpec((1, 1, bkv, d), kv_index),
        pl.BlockSpec((1, 1, bkv, d), kv_index),
    ]
    args = [q, k, v]
    if use_rope:
        rope_cos = jnp.asarray(rope_cos, jnp.float32)
        rope_sin = jnp.asarray(rope_sin, jnp.float32)
        if rope_cos.shape[0] < sk_pad or rope_cos.shape[0] < sq_pad:
            pad_to = max(sk_pad, sq_pad)
            pad = pad_to - rope_cos.shape[0]
            rope_cos = jnp.pad(rope_cos, ((0, max(pad, 0)), (0, 0)),
                               constant_values=1.0)
            rope_sin = jnp.pad(rope_sin, ((0, max(pad, 0)), (0, 0)))
        in_specs += [
            pl.BlockSpec((bq, half_d), lambda b, hk, i, j: (i, 0)),
            pl.BlockSpec((bq, half_d), lambda b, hk, i, j: (i, 0)),
            pl.BlockSpec((bkv, half_d), kv_index_rope),
            pl.BlockSpec((bkv, half_d), kv_index_rope),
        ]
        args += [rope_cos, rope_sin, rope_cos, rope_sin]

    dynamic_kv_len = kv_len is not None
    if dynamic_kv_len:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(kv_len, jnp.int32).reshape(1))

    out_specs = [
        pl.BlockSpec((1, group, bq, d), lambda b, hk, i, j: (b, hk, i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, hq, sq_pad, d), q.dtype),
    ]
    if return_lse:
        out_specs.append(pl.BlockSpec(
            (1, group, bq, NUM_LANES), lambda b, hk, i, j: (b, hk, i, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, hq, sq_pad, NUM_LANES), jnp.float32))
    rows = group * bq
    import os as _os
    pipeline = _os.environ.get("AULE_FLASH_PIPELINE") == "1"
    scratch_shapes = [
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),  # m
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),  # l
        pltpu.VMEM((rows, d), jnp.float32),          # acc
    ]
    if pipeline:
        scratch_shapes.append(
            pltpu.VMEM((2, rows, bkvc), jnp.float32))  # s double buffer

    kernel = functools.partial(
        _fwd_kernel,
        scale=float(scale), causal=causal, window=window, group=group,
        block_q=bq, block_kv=bkv, block_kv_compute=bkvc,
        seq_q=seq_q, seq_k=seq_k,
        n_kv=n_kv, use_rope=use_rope, return_lse=return_lse,
        ragged=(sk_pad != seq_k) or dynamic_kv_len,
        dynamic_kv_len=dynamic_kv_len, diag_strips=diag_strips,
        diag_pair=_flash_diag_pair(), pipeline=pipeline,
    )

    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu"
        )

    flops = 4 * batch * hq * seq_q * seq_k * d
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * hq * seq_q * seq_k,
        ),
        interpret=interpret,
    )(*args)

    out = results[0]
    if sq_pad != seq_q:
        out = out[:, :, :seq_q]
    if out_cast is not None:
        out = out.astype(out_cast)
    if not return_lse:
        return out
    lse = results[1][..., 0]  # compact [B, Hq, Sq]
    if sq_pad != seq_q:
        lse = lse[:, :, :seq_q]
    return out, lse


def flash_attention_rope(
    q, k, v, rope_cos, rope_sin, *,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
):
    """Inference fast path: RoPE fused INSIDE the kernel (no rotated Q/K
    materialized in HBM).  Forward-only — the reference's
    `flash_attention_rope` contract (triton_flash.py:561-603); training
    callers use flash_attention_pallas, which composes the rotation
    differentiably outside the kernel."""
    return flash_attention_fwd(
        q, k, v, causal=causal, scale=scale, window_size=window_size,
        rope_cos=rope_cos, rope_sin=rope_sin, return_lse=False,
    )


def flash_attention_pallas(
    q, k, v, *,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
    rope_cos=None,
    rope_sin=None,
):
    """Differentiable public pallas-backend entry (custom_vjp lives in
    flash_vjp.py; forward-only callers get just the output)."""
    from .flash_vjp import flash_attention_vjp

    return flash_attention_vjp(
        q, k, v, causal, scale, window_size, rope_cos, rope_sin
    )
