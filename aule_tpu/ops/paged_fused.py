"""Fused-layout paged decode: one DMA per page covering K+V and ALL kv heads.

Decode throughput on TPU is limited by DMA issue rate when pages are small:
the head-major vLLM layout (ops/paged.py) needs `2 * Hkv` DMAs per page
(K and V, per head).  This kernel adopts the reference's own pool layout
(src/block_pool.zig:9-16 / attention_paged.comp:76-104 — [blocks, 2, KVH,
page, D]) so each page is ONE contiguous slab:

    kv_pages: [num_pages, 2, Hkv, page_size, D]   (axis 1: 0=K, 1=V)

cutting DMA count by 2*Hkv and growing each transfer by the same factor
(e.g. 4 KB -> 64 KB for Hkv=8, D=128, page=16 bf16).  The grid also drops
the head dimension: every kv head is computed per step via a batched
dot_general over the resident slab.

Quantized variant: per-token-per-head scales ride as ONE bf16 tile per
page in TOKEN-MAJOR layout,
    kv_scales: [num_pages, page_size, 128] bf16
with row = slot (token within the page) and lane = kv*64 + h (kv: 0=K,
1=V; requires Hkv <= 64).  Rationale: the kernel consumes scales on the
SCORE side, not the payload side — K scales multiply the [Hkv, G, tokens]
score tile (tokens on lanes) and V scales multiply the probability tile —
so the payload never pays a per-element dequant multiply, and int8 pools
run both matmuls on the int8 MXU (q and p are quantized per row; the
INT-FlashAttention pattern, PAPERS.md).  Token-major rows make the
lane-major factor build legal in Mosaic: the DMA'd [ppcb, page, 128] tile
sublane-merges to [tokens, 128], ONE 2-D transpose yields [128, tokens]
(tokens on lanes), and a sublane split/slice peels K and V rows.  Cost:
one (page,128) bf16 tile per page = +12.5% bytes over an int8 payload.
Use `pack_fused_scales`/`unpack_fused_scales` to convert from head-major
[Hkv, P, page] f32 scales.

Layout converters to/from the vLLM-style pools are provided; the serving
engine uses the fused layout natively.
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
from .flash import DEFAULT_MASK_VALUE, NUM_LANES
from .quant import (E4M3_EXPAND_SHIFT, e4m3_expand_scaled,
                    e4m3_expand_scaled_bf16)

MIN_GROUP_PAD = 8


def pad_head_dim(d: int) -> int:
    """Pools store head_dim padded to the lane width: Mosaic DMA slices
    must be 128-aligned in the minor dim, so a D=64 pool could not be
    sliced per page at all (zeros in the pad lanes are exact no-ops in
    both matmuls)."""
    return -(-d // NUM_LANES) * NUM_LANES


def fused_pool_shape(num_pages: int, hkv: int, page_size: int,
                     head_dim: int):
    return (num_pages, 2, hkv, page_size, pad_head_dim(head_dim))


def _pad_last(x, to: int):
    if x.shape[-1] == to:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])])


# half the scale-tile lanes hold K scales (lane = h), half V (lane = 64+h)
SCALE_KV_STRIDE = NUM_LANES // 2
SCALE_DTYPE = jnp.bfloat16


def scale_rows(hkv: int, page_size: int) -> int:
    """Rows of the packed scale tile: token-major, one row per slot."""
    del hkv
    return page_size


def fused_scales_shape(num_pages: int, hkv: int, page_size: int,
                       tp: int = 1):
    """Packed scale-pool shape.  With tensor parallelism the lane dim is
    tp*128: sharding the last dim over the model axis hands each shard a
    [P, page, 128] tile packed with ITS OWN (local) heads at lane
    kv*64 + h_local — the kernel is tp-agnostic."""
    if hkv > SCALE_KV_STRIDE:
        raise ValueError(f"fused scale layout supports Hkv <= "
                         f"{SCALE_KV_STRIDE}, got {hkv}")
    return (num_pages, page_size, tp * NUM_LANES)


def pack_fused_scales(k_scales, v_scales, dtype=SCALE_DTYPE):
    """Head-major scales [Hkv, P, page] x2 -> packed [P, page, 128]
    (row = slot, lane = kv*64 + h).  Default bf16 (half the scale-DMA
    bytes; ~2^-8 relative rounding); pass jnp.float32 for exactness
    (the split-layout compat path's fold-equals-dequant contract)."""
    hkv, num_pages, page_size = k_scales.shape
    fused_scales_shape(num_pages, hkv, page_size)  # validates hkv

    def part(s):
        lanes = jnp.moveaxis(s, 0, -1)  # [P, page, Hkv]
        return jnp.pad(lanes, ((0, 0), (0, 0),
                               (0, SCALE_KV_STRIDE - hkv)))

    return jnp.concatenate(
        [part(k_scales), part(v_scales)], axis=-1).astype(dtype)


def unpack_fused_scales(packed, hkv: int, page_size: int):
    """Packed [P, page, 128] -> head-major f32 ([Hkv,P,page], [Hkv,P,page])."""
    del page_size

    def heads(lane0):
        part = packed[..., lane0:lane0 + hkv].astype(jnp.float32)
        return jnp.moveaxis(part, -1, 0)

    return heads(0), heads(SCALE_KV_STRIDE)


def to_fused_layout(k_pages, v_pages, k_scales=None, v_scales=None,
                    scale_dtype=SCALE_DTYPE):
    """[Hkv, P, page, D] x2 -> [P, 2, Hkv, page, Dpad] (+ packed scales).

    D pads to the lane width (see pad_head_dim); the attention wrappers
    pad q / slice outputs to match, so callers never see the padding.
    """
    kv = jnp.stack([jnp.swapaxes(k_pages, 0, 1),
                    jnp.swapaxes(v_pages, 0, 1)], axis=1)
    kv = _pad_last(kv, pad_head_dim(kv.shape[-1]))
    if k_scales is None:
        return kv
    return kv, pack_fused_scales(k_scales, v_scales, dtype=scale_dtype)


def from_fused_layout(kv_pages, head_dim: Optional[int] = None):
    """[P, 2, Hkv, page, Dpad] -> (k_pages, v_pages) head-major, sliced
    back to `head_dim` when given."""
    if head_dim is not None:
        kv_pages = kv_pages[..., :head_dim]
    return (jnp.swapaxes(kv_pages[:, 0], 0, 1),
            jnp.swapaxes(kv_pages[:, 1], 0, 1))


def _page_dma_helpers(b, ppcb, quantized, kv_hbm, sc_hbm, bt_ref,
                      cont_ref, kv_buf, sc_buf, kv_sem, sc_sem):
    """(start_dma, wait_dma) closures shared by the decode and prefill
    kernels.

    Contiguous-run coalescing: the page allocator hands out LIFO runs, so
    a compute block's ppcb pages are usually physically consecutive — one
    big DMA instead of ppcb small ones.  Both start paths move the same
    bytes through the same semaphore, so the single big-descriptor wait
    matches either.
    """

    def start_dma(block_idx, slot):
        contiguous = cont_ref[b, block_idx] == 1
        start_page = jnp.maximum(bt_ref[b, block_idx * ppcb], 0)

        @pl.when(contiguous)
        def _one_dma():
            pltpu.make_async_copy(
                kv_hbm.at[pl.ds(start_page, ppcb)], kv_buf.at[slot],
                kv_sem.at[slot]).start()
            if quantized:
                pltpu.make_async_copy(
                    sc_hbm.at[pl.ds(start_page, ppcb)], sc_buf.at[slot],
                    sc_sem.at[slot]).start()

        @pl.when(jnp.logical_not(contiguous))
        def _per_page():
            for p in range(ppcb):
                page_id = jnp.maximum(bt_ref[b, block_idx * ppcb + p], 0)
                pltpu.make_async_copy(
                    kv_hbm.at[page_id], kv_buf.at[slot, p],
                    kv_sem.at[slot]).start()
                if quantized:
                    pltpu.make_async_copy(
                        sc_hbm.at[page_id], sc_buf.at[slot, p],
                        sc_sem.at[slot]).start()

    def wait_dma(slot):
        pltpu.make_async_copy(
            kv_hbm.at[pl.ds(0, ppcb)], kv_buf.at[slot],
            kv_sem.at[slot]).wait()
        if quantized:
            pltpu.make_async_copy(
                sc_hbm.at[pl.ds(0, ppcb)], sc_buf.at[slot],
                sc_sem.at[slot]).wait()

    return start_dma, wait_dma


def _build_factor_tiles(sc_tile, hkv: int, page_size: int, ppcb: int):
    """Packed [ppcb, page, 128] scale tile -> (kf, vf) [hkv, tokens] f32
    with tokens on LANES (lane c = page_idx*page_size + slot).

    The only Mosaic-legal route: sublane-merge to [tokens, 128], ONE 2-D
    lane<->sublane transpose, then sublane split/slice to peel K and V."""
    tokens = ppcb * page_size
    x = sc_tile.reshape(tokens, NUM_LANES)
    t = jnp.swapaxes(x, 0, 1).reshape(2, SCALE_KV_STRIDE, tokens)
    return (t[0][:hkv].astype(jnp.float32),
            t[1][:hkv].astype(jnp.float32))


def _fused_decode_kernel(
    ctx_ref, bt_ref, cont_ref,        # scalar prefetch
    q_ref,                            # [1, HkvGp, D] VMEM (int8 if int8_path)
    kv_hbm,                           # [P, 2, Hkv, page, D] ANY
    *rest,
    page_size: int,
    ppcb: int,
    n_blocks: int,
    hkv: int,
    gp: int,
    scale: float,
    window: int,
    quantized: bool,
    int8_path: bool,
    fp8_path: bool,
    return_lse: bool,
    nbatch: int,
    cross_batch: bool,
):
    rest = list(rest)
    sc_hbm = rest.pop(0) if quantized else None  # [P, page, 128] bf16
    qf_ref = rest.pop(0) if int8_path else None  # [1, HkvGp, 128] f32
    o_ref = rest.pop(0)
    lse_ref = rest.pop(0) if return_lse else None
    sb_ref = rest.pop() if cross_batch else None  # SMEM slot-parity baton
    if quantized:
        (m_scr, l_scr, acc_scr, kv_buf, sc_buf, kv_sem, sc_sem) = rest
    else:
        (m_scr, l_scr, acc_scr, kv_buf, kv_sem) = rest
        sc_buf = sc_sem = None

    b = pl.program_id(0)
    i = pl.program_id(1)

    length = ctx_ref[b]
    tokens_per_block = page_size * ppcb

    def win_first(ln):
        """First live block under a sliding window: decode attends only
        the trailing W tokens, so blocks before (len-W) are dead — skip
        their DMA AND compute (the prefill kernel already does this via
        first_vis; without it a W=4k decode over 32k ctx paid 8x the
        bandwidth, r4).  The front block's sub-window tokens are masked
        by the (length-1-pos) < window term below."""
        if window <= 0:
            return jnp.int32(0)
        return jnp.maximum(ln - window, 0) // tokens_per_block

    first = win_first(length)
    n_live = pl.cdiv(length, tokens_per_block) - first

    start_dma, wait_dma = _page_dma_helpers(
        b, ppcb, quantized, kv_hbm, sc_hbm, bt_ref, cont_ref,
        kv_buf, sc_buf, kv_sem, sc_sem)

    if cross_batch:
        # Cross-batch pipeline: batch b's LAST live block prefetches
        # batch b+1's first block, so short contexts (few blocks per
        # sequence) don't expose a DMA fill at every batch boundary.
        # Double-buffer slots keep alternating ACROSS batches — the
        # starting slot parity rides an SMEM baton (requires sequential
        # grid order: the batch dim is "arbitrary", not "parallel").
        bp1 = jnp.minimum(b + 1, nbatch - 1)
        start_dma_next, _ = _page_dma_helpers(
            bp1, ppcb, quantized, kv_hbm, sc_hbm, bt_ref, cont_ref,
            kv_buf, sc_buf, kv_sem, sc_sem)

        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _baton0():
            sb_ref[0] = 0

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

        if cross_batch:
            # self-start only when no predecessor prefetched for us
            # (first batch, or the previous batch had no live blocks)
            bm1 = jnp.maximum(b - 1, 0)
            prev_empty = (pl.cdiv(ctx_ref[bm1], tokens_per_block)
                          - win_first(ctx_ref[bm1])) == 0

            @pl.when(jnp.logical_and(
                n_live > 0, jnp.logical_or(b == 0, prev_empty)))
            def _():
                start_dma(first, jax.lax.rem(sb_ref[0], 2))
        else:
            @pl.when(n_live > 0)
            def _():
                start_dma(first, 0)

    @pl.when(i < n_live)
    def _compute():
        base = sb_ref[0] if cross_batch else 0
        slot = jax.lax.rem(base + i, 2)

        @pl.when(i + 1 < n_live)
        def _prefetch():
            start_dma(first + i + 1, 1 - slot)

        if cross_batch:
            last = i == n_live - 1
            ctx_next = ctx_ref[jnp.minimum(b + 1, nbatch - 1)]
            next_live = jnp.logical_and(
                b + 1 < nbatch,
                pl.cdiv(ctx_next, tokens_per_block)
                - win_first(ctx_next) > 0)

            @pl.when(jnp.logical_and(last, next_live))
            def _prefetch_next_batch():
                start_dma_next(win_first(ctx_next),
                               jax.lax.rem(base + n_live, 2))

            @pl.when(last)
            def _pass_baton():
                sb_ref[0] = jax.lax.rem(base + n_live, 2)

        wait_dma(slot)

        precision = (jax.lax.Precision.HIGHEST
                     if q_ref.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
        # buf: [ppcb, 2, Hkv, page, D] -> K/V [Hkv, tokens, D]
        buf = kv_buf[slot]
        q = q_ref[0].reshape(hkv, gp, -1)  # [Hkv, Gp, D]
        if fp8_path:
            # expanded k/v are f32 (cast-free expansion); Mosaic has no
            # mixed-dtype matmul, so q (tiny) joins them in f32
            q = q.astype(jnp.float32)
        kf = vf = None
        k = jnp.swapaxes(buf[:, 0], 0, 1).reshape(
            hkv, tokens_per_block, -1)
        v = jnp.swapaxes(buf[:, 1], 0, 1).reshape(
            hkv, tokens_per_block, -1)
        if quantized:
            # Scales apply on the SCORE/probability side (tokens on
            # lanes): the payload never pays a per-element dequant
            # multiply (the r1 kernel's payload-side dequant was
            # VPU-bound at ~2 ops/elem and erased the int8 byte win).
            kf, vf = _build_factor_tiles(
                sc_buf[slot], hkv, page_size, ppcb)
            if fp8_path:
                # e4m3 payloads arrive BITCAST as int8 (the wrapper
                # strips the fp8 dtype before pallas_call): expand with
                # select-free integer bit math + one magic multiply
                # (quant.e4m3_expand_scaled) — Mosaic's own software
                # float8 cast is ~6x slower (r3 verdict), and the r4
                # select-based expansion ran at bf16 wall speed (the
                # VPU ate the byte win).  Payloads come out as
                # value*2^-40; the 2^+40 folds into the kf/vf factor
                # tiles below (one multiply per [Hkv, tokens] tile).
                # bf16 compute: exact bit relocation at 16-bit lane
                # width (e4m3_expand_scaled_bf16) — half the VPU cost
                # of the i32 pipeline and no narrowing cast.
                # expand straight to f32 and run both matmuls in
                # f32 (q is tiny; the MXU is idle in decode): saves the
                # [Hkv, tokens, D] bf16 narrowing casts on k AND v plus
                # the p cast — ~3 of the ~9 VPU ops/elem.  The 16-bit
                # lane variant (e4m3_expand_scaled_bf16) is blocked in
                # Mosaic: i16 shifts fail to legalize and the i16
                # mul/add form SIGABRTs the scheduler's latency table
                # (chip-verified r5); it stays available for XLA-level
                # callers.
                k = e4m3_expand_scaled(k, jnp.float32)
                v = e4m3_expand_scaled(v, jnp.float32)
                comp = jnp.float32(2.0 ** E4M3_EXPAND_SHIFT)
                kf = kf * comp
                vf = vf * comp
            elif not int8_path:
                cdt = q_ref.dtype
                k = k.astype(cdt)
                v = v.astype(cdt)

        if int8_path:
            # int8 MXU for q.K^T: exact i32 accumulation; per-row q
            # scale (folded with the softmax scale) rides in qf_ref
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            qf = qf_ref[0][:, :1].reshape(hkv, gp, 1)
            s = s * qf * kf[:, None, :]
        else:
            # batched over kv heads: [Hkv, Gp, tokens]
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            ) * scale
            if quantized:
                s = s * kf[:, None, :]
        s = s.reshape(hkv * gp, tokens_per_block)

        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + (first + i) * tokens_per_block
        valid = pos < length
        if window > 0:
            valid = jnp.logical_and(valid, (length - 1 - pos) < window)
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        p = jnp.where(valid, p, 0.0)
        l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = jnp.broadcast_to(l_next[:, :1], l_prev.shape)

        p3 = p.reshape(hkv, gp, tokens_per_block)
        if quantized:
            # V scales fold into p (cheap [Hkv,Gp,tokens] multiply);
            # l above already summed the UNSCALED p
            p3 = p3 * vf[:, None, :]
        if int8_path:
            # quantize p per row for the int8 PV matmul (p >= 0, so
            # floor(x+0.5) == round and dodges rint lowering)
            pm = jnp.max(p3, axis=2, keepdims=True)
            r = jnp.where(pm > 0.0, 127.0 / pm, 0.0)
            p_i8 = jnp.floor(p3 * r + 0.5).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_i8, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (pm * (1.0 / 127.0))
        else:
            pv = jax.lax.dot_general(
                p3.astype(v.dtype), v,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [Hkv, Gp, D]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] \
            + pv.reshape(hkv * gp, -1)

    @pl.when(i == n_blocks - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        if return_lse:
            lv = l_scr[...]
            lse = jnp.where(
                lv > 0.0,
                m_scr[...] + jnp.log(jnp.where(lv > 0.0, lv, 1.0)),
                DEFAULT_MASK_VALUE)
            lse_ref[0] = lse.astype(lse_ref.dtype)


def paged_attention_fused(
    q: jnp.ndarray,                # [B, Hq, D]
    kv_pages: jnp.ndarray,         # [P, 2, Hkv, page, D]
    block_tables: jnp.ndarray,     # [B, max_pages]
    context_lens: jnp.ndarray,     # [B]
    *,
    kv_scales: Optional[jnp.ndarray] = None,   # packed [P, page, 128]
    scale: Optional[float] = None,
    window_size: int = -1,
    pages_per_compute_block: Optional[int] = None,
    int8_matmul: Optional[bool] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused-layout paged decode (see module docstring).

    int8_matmul: run both matmuls on the int8 MXU for int8 pools
    (quantizing q and p per row — the INT-FlashAttention fast path,
    ~2x bf16 tok/s at ~1% extra error).  Default on for int8 pools;
    pass False for the exact cast-path (scale folding then equals
    explicit dequantization bit-for-bit up to f32 rounding, the split
    layout's documented contract).

    With return_lse=True also returns natural-log LSE [B, Hq] (used by
    the cross-shard softmax combine, parallel/collectives.py)."""
    batch, hq, d_true = q.shape
    num_pages, _, hkv, page_size, d = kv_pages.shape
    group = hq // hkv
    max_pages = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d_true))
    if d != pad_head_dim(d_true):
        raise ValueError(
            f"kv_pages head_dim {d} does not match padded q head_dim "
            f"{pad_head_dim(d_true)} (see to_fused_layout/fused_pool_shape)")
    q = _pad_last(q, d)
    window = int(window_size) if window_size and window_size > 0 else -1
    quantized = kv_scales is not None
    if not quantized and jnp.issubdtype(kv_pages.dtype, jnp.integer):
        raise ValueError(
            "integer KV pools need kv_scales (attention over raw int8 "
            "codes is meaningless); see ops/quant.quantize_kv")

    ppcb = (pages_per_compute_block
            or get_tile_config(
                head_dim=d, seq=max_pages * page_size
            ).pages_per_compute_block_fused)
    ppcb = _cap_ppcb(ppcb, hkv, page_size, d, kv_pages.dtype)
    ppcb = min(ppcb, max_pages)
    if max_pages % ppcb != 0:
        pad = ppcb - max_pages % ppcb
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        max_pages += pad
    n_blocks = max_pages // ppcb

    sr = scale_rows(hkv, page_size)
    if quantized and kv_scales.shape != (num_pages, sr, NUM_LANES):
        raise ValueError(
            f"kv_scales must be packed {(num_pages, sr, NUM_LANES)} "
            f"(see pack_fused_scales), got {kv_scales.shape}")
    if int8_matmul is None:
        int8_matmul = not get_config().int8_exact
    int8_path = bool(quantized and kv_pages.dtype == jnp.int8
                     and int8_matmul)
    # fp8 pools enter the kernel BITCAST as int8 and expand via integer
    # bit math (quant.e4m3_expand) — v5e has no fp8 hardware and
    # Mosaic's software float8 cast is ~6x slower (r3 verdict)
    fp8_path = bool(quantized and kv_pages.dtype == jnp.float8_e4m3fn)
    if fp8_path:
        kv_pages = jax.lax.bitcast_convert_type(kv_pages, jnp.int8)

    # Mosaic has no mixed-dtype matmul: align q to the pool dtype on the
    # unquantized path (q is tiny; the pools are not).
    if not quantized and q.dtype != kv_pages.dtype:
        q = q.astype(kv_pages.dtype)

    # group rows per kv head, padded so each head's row block is sublane
    # aligned: q -> [B, Hkv * Gp, D]
    gp = group if group % MIN_GROUP_PAD == 0 else _pad_group(group)
    qg = q.reshape(batch, hkv, group, d)
    if gp != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - group), (0, 0)))
    qg = qg.reshape(batch, hkv * gp, d)

    out_dtype = q.dtype
    qf_arr = None
    if int8_path:
        # per-row amax quantization of q; the softmax scale folds into
        # the per-row factor so the kernel's int8 scores need only two
        # cheap [rows, tokens]-shaped multiplies
        qf32 = qg.astype(jnp.float32)
        qabs = jnp.max(jnp.abs(qf32), axis=-1)          # [B, rows]
        qscale = jnp.where(qabs == 0.0, 1.0, qabs / 127.0)
        qg = jnp.clip(jnp.round(qf32 / qscale[..., None]), -127, 127
                      ).astype(jnp.int8)
        qf_arr = jnp.broadcast_to(
            (qscale * scale)[..., None],
            qscale.shape + (NUM_LANES,)).astype(jnp.float32)

    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu"
        )

    in_specs = [
        pl.BlockSpec((1, hkv * gp, d), lambda b, i, *_: (b, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [qg, kv_pages]
    scratch = [
        pltpu.VMEM((hkv * gp, NUM_LANES), jnp.float32),
        pltpu.VMEM((hkv * gp, NUM_LANES), jnp.float32),
        pltpu.VMEM((hkv * gp, d), jnp.float32),
        pltpu.VMEM((2, ppcb, 2, hkv, page_size, d), kv_pages.dtype),
    ]
    sems = [pltpu.SemaphoreType.DMA((2,))]
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(kv_scales)
        if int8_path:
            in_specs.append(pl.BlockSpec(
                (1, hkv * gp, NUM_LANES), lambda b, i, *_: (b, 0, 0)))
            args.append(qf_arr)
        scratch.append(pltpu.VMEM((2, ppcb, sr, NUM_LANES),
                                  kv_scales.dtype))
        sems.append(pltpu.SemaphoreType.DMA((2,)))

    from ..config import decode_xbatch
    cross_batch = decode_xbatch()
    if cross_batch:
        # the slot-parity baton unpacks LAST in the kernel (rest.pop())
        sems.append(pltpu.SMEM((1,), jnp.int32))

    # per-(seq, block) physical-contiguity flags for DMA coalescing
    bt_blocks = block_tables.reshape(batch, n_blocks, ppcb)
    expected = bt_blocks[..., :1] + jnp.arange(ppcb, dtype=jnp.int32)
    cont = jnp.all(bt_blocks == expected, axis=-1)
    cont = jnp.logical_and(cont, bt_blocks[..., 0] >= 0)
    # a coalesced run must not read past the pool end
    cont = jnp.logical_and(cont, bt_blocks[..., 0] + ppcb <= num_pages)
    cont = cont.astype(jnp.int32)

    out_specs = [pl.BlockSpec((1, hkv * gp, d), lambda b, i, *_: (b, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((batch, hkv * gp, d), out_dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec((1, hkv * gp, NUM_LANES),
                                      lambda b, i, *_: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, hkv * gp, NUM_LANES), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch + sems,
    )

    kernel = functools.partial(
        _fused_decode_kernel,
        page_size=page_size, ppcb=ppcb, n_blocks=n_blocks,
        hkv=hkv, gp=gp, scale=float(scale), window=window,
        quantized=quantized, int8_path=int8_path, fp8_path=fp8_path,
        return_lse=return_lse, nbatch=batch, cross_batch=cross_batch,
    )

    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # batch must execute in grid order for the cross-batch DMA
            # baton (one TensorCore runs the grid sequentially anyway)
            dimension_semantics=(
                ("arbitrary" if cross_batch else "parallel"),
                "arbitrary"),
        ),
        interpret=interpret,
    )(context_lens.astype(jnp.int32), block_tables.astype(jnp.int32),
      cont, *args)

    out = results[0].reshape(batch, hkv, gp, d)[:, :, :group, :d_true]
    out = out.reshape(batch, hq, d_true)
    if return_lse:
        lse = results[1].reshape(batch, hkv, gp, NUM_LANES)
        lse = lse[:, :, :group, 0].reshape(batch, hq)
        return out, lse
    return out


def _pad_group(group: int) -> int:
    return ((group + MIN_GROUP_PAD - 1) // MIN_GROUP_PAD) * MIN_GROUP_PAD


# double-buffered KV staging budget; the ~16 MiB scoped-VMEM limit also
# holds q/acc/stats/scale buffers and the compiler's own scratch
_KV_BUF_BUDGET = 8 * 1024 * 1024


def _cap_ppcb(ppcb: int, hkv: int, page_size: int, d: int, dtype) -> int:
    """Cap pages-per-compute-block so 2 staging slots fit the budget —
    the tuned default (32) assumes bf16 GQA-8 D=128 slabs; MHA/f32/long
    pages scale the slab up by 8x+ and must shrink the block."""
    slab = 2 * hkv * page_size * d * jnp.dtype(dtype).itemsize
    return max(1, min(ppcb, _KV_BUF_BUDGET // (2 * slab)))


def _scale_scatter_coords(hkv, page_size, slot):
    """(rows, lanes) [**slot.shape**, 2, Hkv] into a token-major scale
    tile (row = slot, lane = kv*64 + h)."""
    del page_size
    lead = (1,) * slot.ndim
    kvi = jnp.arange(2).reshape(lead + (2, 1))
    hi = jnp.arange(hkv).reshape(lead + (1, hkv))
    rows = jnp.broadcast_to(slot[..., None, None],
                            slot.shape + (2, hkv))
    return rows, kvi * SCALE_KV_STRIDE + hi


def kv_cache_append_decode_fused(
    kv_pages: jnp.ndarray,      # [P, 2, Hkv, page, D]
    k_new: jnp.ndarray,         # [B, Hkv, D]
    v_new: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    kv_scales: Optional[jnp.ndarray] = None,  # packed [P, SR, 128]
):
    """Append one token per sequence to a fused pool; quantizes on the way
    in when a scales pool is passed."""
    hkv = k_new.shape[1]
    page_size = kv_pages.shape[3]
    batch = k_new.shape[0]
    slot = context_lens % page_size
    phys = jnp.maximum(
        block_tables[jnp.arange(batch), context_lens // page_size], 0)
    new = jnp.stack([k_new, v_new], axis=1)  # [B, 2, Hkv, D]
    new = _pad_last(new, kv_pages.shape[-1])
    if kv_scales is not None:
        from .quant import quantize_kv

        payload, sc = quantize_kv(new, kv_pages.dtype)  # sc [B, 2, Hkv]
        kv_pages = kv_pages.at[phys, :, :, slot].set(payload)
        rows, lanes = _scale_scatter_coords(hkv, page_size, slot)
        kv_scales = kv_scales.at[phys[:, None, None], rows, lanes].set(
            sc.astype(kv_scales.dtype))
        return kv_pages, kv_scales, context_lens + 1
    kv_pages = kv_pages.at[phys, :, :, slot].set(new.astype(kv_pages.dtype))
    return kv_pages, context_lens + 1


def kv_cache_append_prefill_fused(
    kv_pages: jnp.ndarray,      # [P, 2, Hkv, page, D]
    k_new: jnp.ndarray,         # [B, Hkv, S, D]
    v_new: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    seq_lens: jnp.ndarray,
    kv_scales: Optional[jnp.ndarray] = None,
):
    """Scatter prefill K/V into a fused pool (masked read-modify-write for
    padding tokens); quantizes when a scales pool is passed."""
    from .paged import _prefill_scatter_coords

    batch, hkv, seq, d = k_new.shape
    page_size = kv_pages.shape[3]
    phys_f, slot_f, valid_f = _prefill_scatter_coords(
        batch, seq, page_size, block_tables, context_lens, seq_lens)
    bsz = batch * seq
    # [B, 2, Hkv, S, D] -> [B*S, 2, Hkv, Dpad]
    new = jnp.stack([k_new, v_new], axis=1)
    new = jnp.moveaxis(new, 3, 1).reshape(bsz, 2, hkv, d)
    new = _pad_last(new, kv_pages.shape[-1])

    def scatter(pool, values):
        old = pool[phys_f, :, :, slot_f]  # [B*S, 2, Hkv, ...]
        mask_shape = (bsz,) + (1,) * (values.ndim - 1)
        vals = jnp.where(valid_f.reshape(mask_shape), values, old)
        return pool.at[phys_f, :, :, slot_f].set(vals)

    if kv_scales is not None:
        from .quant import quantize_kv

        payload, sc = quantize_kv(new, kv_pages.dtype)  # sc [B*S, 2, Hkv]
        kv_pages = scatter(kv_pages, payload)
        rows, lanes = _scale_scatter_coords(hkv, page_size, slot_f)
        idx = (phys_f[:, None, None], rows, lanes)
        old = kv_scales[idx]
        vals = jnp.where(valid_f[:, None, None], sc, old)
        kv_scales = kv_scales.at[idx].set(vals.astype(kv_scales.dtype))
        return kv_pages, kv_scales, context_lens + seq_lens
    kv_pages = scatter(kv_pages, new.astype(kv_pages.dtype))
    return kv_pages, context_lens + seq_lens


# ---------------------------------------------------------------------------
# Paged PREFILL: multi-token queries attending to the paged cache.
#
# The reference's only multi-token paged path re-pages contiguous K/V on
# every call and frees it after (attention_gpu.zig:484-653, an MVP quirk);
# here the cache is persistent and caller-owned, which is what chunked
# prefill / multi-turn serving needs: append the new chunk with
# kv_cache_append_prefill_fused, then attend over cache history + chunk in
# one kernel.  Causality is positional: the query at absolute position
# q_offset[b] + s sees cache tokens 0 .. q_offset[b] + s.
# ---------------------------------------------------------------------------


def _fused_prefill_kernel(
    ctx_ref, qoff_ref, bt_ref, cont_ref,   # scalar prefetch
    q_ref,                                 # [1, Hkv, Gp, bq, D] VMEM
    kv_hbm,                                # [P, 2, Hkv, page, D] ANY
    *rest,
    page_size: int,
    ppcb: int,
    n_blocks: int,
    block_q: int,
    hkv: int,
    gp: int,
    scale: float,
    window: int,
    causal: bool,
    quantized: bool,
    fp8_path: bool,
    return_lse: bool,
):
    rest = list(rest)
    sc_hbm = rest.pop(0) if quantized else None
    o_ref = rest.pop(0)
    lse_ref = rest.pop(0) if return_lse else None
    if quantized:
        (m_scr, l_scr, acc_scr, kv_buf, sc_buf, kv_sem, sc_sem) = rest
    else:
        (m_scr, l_scr, acc_scr, kv_buf, kv_sem) = rest
        sc_buf = sc_sem = None

    b = pl.program_id(0)
    qi = pl.program_id(1)
    i = pl.program_id(2)

    length = ctx_ref[b]
    q_off = qoff_ref[b]
    tokens_per_block = page_size * ppcb
    # tokens visible to the LAST row of this q block
    q_hi = q_off + (qi + 1) * block_q
    visible = jnp.minimum(length, q_hi) if causal else length
    n_live = pl.cdiv(visible, tokens_per_block)
    lo_block = 0
    if window > 0:
        # prefill window convention matches the flash kernel / oracle:
        # qpos - kpos <= window (decode uses trailing-W, see ops/paged.py)
        first_vis = jnp.maximum(q_off + qi * block_q - window, 0)
        lo_block = first_vis // tokens_per_block

    start_dma, wait_dma = _page_dma_helpers(
        b, ppcb, quantized, kv_hbm, sc_hbm, bt_ref, cont_ref,
        kv_buf, sc_buf, kv_sem, sc_sem)

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

        @pl.when(n_live > lo_block)
        def _():
            start_dma(lo_block, 0)

    run = jnp.logical_and(i >= lo_block, i < n_live)

    @pl.when(run)
    def _compute():
        slot = jax.lax.rem(i - lo_block, 2)

        @pl.when(i + 1 < n_live)
        def _prefetch():
            start_dma(i + 1, 1 - slot)

        wait_dma(slot)

        precision = (jax.lax.Precision.HIGHEST
                     if q_ref.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
        buf = kv_buf[slot]
        kf = vf = None
        k = jnp.swapaxes(buf[:, 0], 0, 1).reshape(
            hkv, tokens_per_block, -1)
        v = jnp.swapaxes(buf[:, 1], 0, 1).reshape(
            hkv, tokens_per_block, -1)
        if quantized:
            # score/probability-side scales (see _build_factor_tiles):
            # the payload pays only the dtype cast, no dequant multiply
            kf, vf = _build_factor_tiles(
                sc_buf[slot], hkv, page_size, ppcb)
            cdt = q_ref.dtype
            if fp8_path:  # e4m3 bitcast as int8; see _fused_decode_kernel
                k = e4m3_expand_scaled(k, jnp.float32)
                v = e4m3_expand_scaled(v, jnp.float32)
                comp = jnp.float32(2.0 ** E4M3_EXPAND_SHIFT)
                kf = kf * comp
                vf = vf * comp
            else:
                k = k.astype(cdt)
                v = v.astype(cdt)
        rows = gp * block_q
        # fold the softmax scale into the q tile ([rows, D]) instead of
        # the score tile ([rows, tokens]): 4x fewer multiplies per block
        q = (q_ref[0].reshape(hkv, rows, -1).astype(jnp.float32)
             * scale).astype(jnp.float32 if fp8_path else q_ref.dtype)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [Hkv, Gp*bq, tokens]
        if quantized:
            s = s * kf[:, None, :]
        s = s.reshape(hkv * rows, tokens_per_block)

        # positional mask: row r of the s tile is query position
        # q_off + qi*bq + (r % bq); column c is cache position
        # i*tokens_per_block + c
        r_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        qpos = q_off + qi * block_q + jax.lax.rem(r_iota, block_q)
        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + i * tokens_per_block
        valid = kpos < length
        if causal:
            valid = jnp.logical_and(valid, kpos <= qpos)
        if window > 0:
            valid = jnp.logical_and(valid, qpos - kpos <= window)
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        p = jnp.where(valid, p, 0.0)
        l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = jnp.broadcast_to(l_next[:, :1], l_prev.shape)

        p3 = p.reshape(hkv, rows, tokens_per_block)
        if quantized:
            p3 = p3 * vf[:, None, :]
        pv = jax.lax.dot_general(
            p3.astype(v.dtype), v,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] \
            + pv.reshape(hkv * rows, -1)

    @pl.when(i == n_blocks - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        if return_lse:
            lv = l_scr[...]
            lse = jnp.where(
                lv > 0.0,
                m_scr[...] + jnp.log(jnp.where(lv > 0.0, lv, 1.0)),
                DEFAULT_MASK_VALUE)
            lse_ref[0] = lse.astype(lse_ref.dtype)


def paged_attention_prefill(
    q: jnp.ndarray,                # [B, Hq, S_new, D]
    kv_pages: jnp.ndarray,         # [P, 2, Hkv, page, D]
    block_tables: jnp.ndarray,     # [B, max_pages]
    context_lens: jnp.ndarray,     # [B] TOTAL visible cache length
    *,
    q_offsets: Optional[jnp.ndarray] = None,  # [B]; default lens - S_new
    kv_scales: Optional[jnp.ndarray] = None,  # packed [P, SR, 128]
    scale: Optional[float] = None,
    causal: bool = True,
    window_size: int = -1,
    block_q: Optional[int] = None,
    pages_per_compute_block: Optional[int] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Chunked/multi-turn prefill over a paged cache.

    Append the chunk first (kv_cache_append_prefill_fused), then call with
    `context_lens` = new total lengths; query s of sequence b sits at
    absolute position `q_offsets[b] + s` and (causally) attends to cache
    positions <= its own.  Rows at positions >= context_lens[b] (padding
    of ragged chunks) produce zeros.  Returns [B, Hq, S_new, D] (+ LSE
    [B, Hq, S_new] with return_lse=True).
    """
    batch, hq, s_new, d_true = q.shape
    num_pages, _, hkv, page_size, d = kv_pages.shape
    group = hq // hkv
    max_pages = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d_true))
    if d != pad_head_dim(d_true):
        raise ValueError(
            f"kv_pages head_dim {d} does not match padded q head_dim "
            f"{pad_head_dim(d_true)} (see to_fused_layout/fused_pool_shape)")
    q = _pad_last(q, d)
    window = int(window_size) if window_size and window_size > 0 else -1
    quantized = kv_scales is not None
    if not quantized and jnp.issubdtype(kv_pages.dtype, jnp.integer):
        raise ValueError(
            "integer KV pools need kv_scales (attention over raw int8 "
            "codes is meaningless); see ops/quant.quantize_kv")
    if q_offsets is None:
        q_offsets = context_lens - s_new

    ppcb = (pages_per_compute_block
            or get_tile_config(
                head_dim=d, seq=max_pages * page_size
            ).pages_per_compute_block_fused)
    ppcb = _cap_ppcb(ppcb, hkv, page_size, d, kv_pages.dtype)
    ppcb = min(ppcb, max_pages)
    if max_pages % ppcb != 0:
        pad = ppcb - max_pages % ppcb
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        max_pages += pad
    n_blocks = max_pages // ppcb

    sr = scale_rows(hkv, page_size)
    if quantized and kv_scales.shape != (num_pages, sr, NUM_LANES):
        raise ValueError(
            f"kv_scales must be packed {(num_pages, sr, NUM_LANES)} "
            f"(see pack_fused_scales), got {kv_scales.shape}")
    if not quantized and q.dtype != kv_pages.dtype:
        q = q.astype(kv_pages.dtype)
    fp8_path = bool(quantized and kv_pages.dtype == jnp.float8_e4m3fn)
    if fp8_path:  # int8 bitcast + in-kernel bit expansion (see decode)
        kv_pages = jax.lax.bitcast_convert_type(kv_pages, jnp.int8)

    gp = group if group % MIN_GROUP_PAD == 0 else _pad_group(group)
    # the kernel's score tile is [hkv*gp*bq, tokens_per_block] f32 — cap
    # total q rows at 1024 to stay inside scoped VMEM
    bq = block_q or max(8, min(1024 // (hkv * gp), s_new))
    sq_pad = -(-s_new // bq) * bq
    n_q = sq_pad // bq

    q5 = q.reshape(batch, hkv, group, s_new, d)
    if gp != group:
        q5 = jnp.pad(q5, ((0, 0), (0, 0), (0, gp - group), (0, 0), (0, 0)))
    if sq_pad != s_new:
        q5 = jnp.pad(q5, ((0, 0), (0, 0), (0, 0), (0, sq_pad - s_new),
                          (0, 0)))

    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu"
        )

    in_specs = [
        pl.BlockSpec((1, hkv, gp, bq, d),
                     lambda b, qi, i, *_: (b, 0, 0, qi, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [q5, kv_pages]
    rows = hkv * gp * bq
    scratch = [
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),
        pltpu.VMEM((rows, d), jnp.float32),
        pltpu.VMEM((2, ppcb, 2, hkv, page_size, d), kv_pages.dtype),
    ]
    sems = [pltpu.SemaphoreType.DMA((2,))]
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(kv_scales)
        scratch.append(pltpu.VMEM((2, ppcb, sr, NUM_LANES),
                                  kv_scales.dtype))
        sems.append(pltpu.SemaphoreType.DMA((2,)))

    bt_blocks = block_tables.reshape(batch, n_blocks, ppcb)
    expected = bt_blocks[..., :1] + jnp.arange(ppcb, dtype=jnp.int32)
    cont = jnp.all(bt_blocks == expected, axis=-1)
    cont = jnp.logical_and(cont, bt_blocks[..., 0] >= 0)
    cont = jnp.logical_and(cont, bt_blocks[..., 0] + ppcb <= num_pages)
    cont = cont.astype(jnp.int32)

    out_specs = [pl.BlockSpec((1, rows, d),
                              lambda b, qi, i, *_: (b, qi, 0))]
    out_shape = [jax.ShapeDtypeStruct((batch, n_q * rows, d), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec(
            (1, rows, NUM_LANES), lambda b, qi, i, *_: (b, qi, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, n_q * rows, NUM_LANES), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(batch, n_q, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch + sems,
    )

    kernel = functools.partial(
        _fused_prefill_kernel,
        page_size=page_size, ppcb=ppcb, n_blocks=n_blocks, block_q=bq,
        hkv=hkv, gp=gp, scale=float(scale), window=window, causal=causal,
        quantized=quantized, fp8_path=fp8_path, return_lse=return_lse,
    )

    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(context_lens.astype(jnp.int32), q_offsets.astype(jnp.int32),
      block_tables.astype(jnp.int32), cont, *args)

    # [B, n_q*hkv*gp*bq, d] rows ordered (qi, h, g, s_local)
    out = results[0].reshape(batch, n_q, hkv, gp, bq, d)
    out = jnp.moveaxis(out, 1, 3)  # [B, hkv, gp, n_q, bq, d]
    out = out.reshape(batch, hkv, gp, sq_pad, d)[
        :, :, :group, :s_new, :d_true]
    out = out.reshape(batch, hq, s_new, d_true)
    if return_lse:
        lse = results[1].reshape(batch, n_q, hkv, gp, bq, NUM_LANES)
        lse = jnp.moveaxis(lse[..., 0], 1, 3)
        lse = lse.reshape(batch, hkv, gp, sq_pad)[:, :, :group, :s_new]
        return out, lse.reshape(batch, hq, s_new)
    return out
