"""Paged attention: vLLM-style decode over a block-table KV cache.

TPU-native re-design of the reference's paged path.  The reference has two
paged designs (SURVEY.md §3.4): a Vulkan demo that re-pages contiguous K/V
every call (attention_gpu.zig:484-653 — a quirk we do NOT replicate) and the
production Triton decode kernel with a caller-owned cache
(triton_flash_amd.py:543-737).  We implement the caller-owned contract with
a TPU-friendly head-major pool layout:

    q:            [B, Hq, D]          one query token per sequence
    k/v_pages:    [Hkv, num_pages, page_size, D]
    block_tables: [B, max_pages]      int32 logical->physical map
    context_lens: [B]                 int32

Head-major pages make one (head, page) slab a contiguous [page_size, D]
block in HBM, so each page load is a single DMA.  The kernel keeps K/V in
HBM (memory_space=ANY), scalar-prefetches the block table, and manually
double-buffers page DMAs against compute — decode is HBM-bandwidth-bound,
so speed of light is (bytes of live KV)/(HBM BW) and the kernel's job is to
keep the DMA engines saturated (the design the reference approximates with
its BLOCK_SIZE=32 gather loop, attention_paged.comp:56-104).
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
from .flash import DEFAULT_MASK_VALUE, NUM_LANES, _cdiv

MIN_GROUP_PAD = 8  # sublane width for f32


def _round_up_lanes(n: int) -> int:
    return -(-n // NUM_LANES) * NUM_LANES


def _paged_decode_kernel(
    # scalar prefetch
    ctx_ref,      # [B] int32
    bt_ref,       # [B, max_pages] int32
    # inputs
    q_ref,        # [1, Hkv, Gp, D] VMEM
    k_hbm,        # [Hkv, num_pages, page, D] ANY/HBM
    v_hbm,
    *rest,        # optional (k_scales_hbm, v_scales_hbm), then outs/scratch
    hkv: int,
    page_size: int,
    ppcb: int,               # pages per compute block
    n_blocks: int,
    scale: float,
    window: int,
    max_pages: int,
    quantized: bool,
    return_lse: bool,
    nbatch: int,
    cross_batch: bool,
):
    """Head-ganged decode step: ALL kv heads ride one strided DMA per page.

    The r2 kernel walked a (batch, hkv, blocks) grid with one [page, D]
    DMA per (head, page) — 2*Hkv descriptors per page made it DMA-issue
    bound (5.9k tok/s vs 41.7k fused, VERDICT r2 Missing #3).  Here the
    grid is (batch, blocks) and one descriptor covers the strided
    [Hkv, page, D] column of the pool, so the issue rate matches the
    fused slab layout's within 2x (K and V live in separate pools — the
    reference's caller-owned contract, triton_flash_amd.py:543-659).
    """
    rest = list(rest)
    ks_hbm = rest.pop(0) if quantized else None
    vs_hbm = rest.pop(0) if quantized else None
    o_ref = rest.pop(0)
    lse_ref = rest.pop(0) if return_lse else None
    sb_ref = rest.pop() if cross_batch else None  # SMEM slot-parity baton
    if quantized:
        (m_scr, l_scr, acc_scr, s_scr, k_buf, v_buf, ks_buf, vs_buf,
         k_sem, v_sem, ks_sem, vs_sem) = rest
    else:
        (m_scr, l_scr, acc_scr, s_scr, k_buf, v_buf, k_sem, v_sem) = rest
        ks_buf = vs_buf = ks_sem = vs_sem = None

    b = pl.program_id(0)
    i = pl.program_id(1)
    gp = q_ref.shape[2]
    d = q_ref.shape[3]

    length = ctx_ref[b]
    tokens_per_block = page_size * ppcb

    def win_first(ln):
        # sliding window: blocks before (len-W) are dead — skip their
        # DMA and compute entirely (paged_fused.py has the same skip)
        if window <= 0:
            return jnp.int32(0)
        return jnp.maximum(ln - window, 0) // tokens_per_block

    first = win_first(length)
    n_live = pl.cdiv(length, tokens_per_block) - first

    def start_dma_for(bb, block_idx, slot):
        """One strided all-heads descriptor per (page, pool)."""
        for p in range(ppcb):
            page_id = bt_ref[bb, block_idx * ppcb + p]
            page_id = jnp.maximum(page_id, 0)  # -1 sentinel -> page 0
            pltpu.make_async_copy(
                k_hbm.at[:, page_id], k_buf.at[slot, :, p], k_sem.at[slot]
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[:, page_id], v_buf.at[slot, :, p], v_sem.at[slot]
            ).start()
            if quantized:
                pltpu.make_async_copy(
                    ks_hbm.at[:, page_id], ks_buf.at[slot, :, p],
                    ks_sem.at[slot]
                ).start()
                pltpu.make_async_copy(
                    vs_hbm.at[:, page_id], vs_buf.at[slot, :, p],
                    vs_sem.at[slot]
                ).start()

    def wait_dma(slot):
        for p in range(ppcb):
            pltpu.make_async_copy(
                k_hbm.at[:, 0], k_buf.at[slot, :, p], k_sem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[:, 0], v_buf.at[slot, :, p], v_sem.at[slot]
            ).wait()
            if quantized:
                pltpu.make_async_copy(
                    ks_hbm.at[:, 0], ks_buf.at[slot, :, p], ks_sem.at[slot]
                ).wait()
                pltpu.make_async_copy(
                    vs_hbm.at[:, 0], vs_buf.at[slot, :, p], vs_sem.at[slot]
                ).wait()

    start_dma = functools.partial(start_dma_for, b)

    if cross_batch:
        # Cross-batch pipeline (mirrors paged_fused.py): batch b's LAST
        # live block prefetches batch b+1's first block so short contexts
        # don't expose a full slab-fill DMA at every batch boundary.
        # Slot parity rides an SMEM baton; requires sequential grid order
        # (batch dim switched to "arbitrary" by the wrapper).
        bp1 = jnp.minimum(b + 1, nbatch - 1)

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
                start_dma_for(bp1, win_first(ctx_next),
                              jax.lax.rem(base + n_live, 2))

            @pl.when(last)
            def _pass_baton():
                sb_ref[0] = jax.lax.rem(base + n_live, 2)

        wait_dma(slot)

        precision = (jax.lax.Precision.HIGHEST
                     if q_ref.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
        # per-head score matmuls land in one [Hkv*Gp, tokens] scratch so
        # the softmax chain runs once over every row (wide VPU vectors)
        for h in range(hkv):
            q = q_ref[0, h]  # [Gp, D]
            k = k_buf[slot, h].reshape(tokens_per_block, d)
            if quantized:
                k = k.astype(q_ref.dtype)
            s_h = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            ) * scale  # [Gp, tokens_per_block]
            if quantized:
                s_h = s_h * ks_buf[slot, h].reshape(1, tokens_per_block)
            s_scr[h * gp:(h + 1) * gp] = s_h

        s = s_scr[...]  # [Hkv*Gp, tokens]
        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + (first + i) * tokens_per_block
        valid = pos < length
        if window > 0:
            valid = jnp.logical_and(valid, (length - 1 - pos) < window)
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        p = jnp.where(valid, p, 0.0)
        l_next = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scr[:, :1] = m_next
        l_scr[:, :1] = l_next

        for h in range(hkv):
            v = v_buf[slot, h].reshape(tokens_per_block, d)
            if quantized:
                v = v.astype(q_ref.dtype)
            p_h = p[h * gp:(h + 1) * gp]
            if quantized:
                p_h = p_h * vs_buf[slot, h].reshape(1, tokens_per_block)
            acc_scr[h * gp:(h + 1) * gp] = (
                acc_scr[h * gp:(h + 1) * gp] * alpha[h * gp:(h + 1) * gp]
                + jax.lax.dot_general(
                    p_h.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=precision,
                ))

    @pl.when(i == n_blocks - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(
            o_ref.dtype).reshape(hkv, gp, d)
        if return_lse:
            m = m_scr[:, :1]
            lv = l_scr[:, :1]
            lse = jnp.where(
                lv > 0.0, m + jnp.log(jnp.where(lv > 0.0, lv, 1.0)),
                DEFAULT_MASK_VALUE)
            lse_ref[0] = jnp.broadcast_to(
                lse, (hkv * gp, NUM_LANES)).astype(
                    lse_ref.dtype).reshape(hkv, gp, NUM_LANES)


def paged_attention(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    *,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    window_size: int = -1,
    pages_per_compute_block: Optional[int] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Paged decode attention (one query token per sequence).

    See module docstring for the cache contract.  Window semantics: only the
    trailing `window_size` tokens of each context are visible
    (triton_flash_amd.py:617-621 behavior).  Pass `k_scales`/`v_scales`
    ([Hkv, num_pages, page_size] f32) with int8/fp8 pools for quantized-KV
    decode (see ops/quant.py).
    """
    batch, hq, d = q.shape
    hkv, num_pages, page_size, _ = k_pages.shape
    group = hq // hkv
    max_pages = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    window = int(window_size) if window_size and window_size > 0 else -1
    quantized = k_scales is not None
    if not quantized and jnp.issubdtype(k_pages.dtype, jnp.integer):
        raise ValueError(
            "integer KV pools need k_scales/v_scales (attention over raw "
            "int8 codes is meaningless); see ops/quant.quantize_kv")

    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu"
        )

    if quantized and not interpret:
        # Mosaic cannot DMA the head-major per-page scale slabs (minor
        # dim = page size, below tiling), and per-(head,page) scale
        # transfers would be 8 tiny DMAs per page anyway.  On real TPUs
        # the quantized compat path converts to the fused layout and
        # uses its packed-scale kernel; callers who care about the
        # conversion cost should hold the cache fused to begin with
        # (serving/engine.py does).
        from .paged_fused import paged_attention_fused, to_fused_layout

        # exact mode: f32 scales + cast-path (no q/p int8 quantization)
        # preserve this API's fold-equals-dequant contract; the serving
        # fast path holds the cache fused with bf16 scales + int8 MXU
        kv, sc = to_fused_layout(k_pages, v_pages, k_scales, v_scales,
                                 scale_dtype=jnp.float32)
        return paged_attention_fused(
            q, kv, block_tables, context_lens, kv_scales=sc, scale=scale,
            window_size=window_size,
            pages_per_compute_block=pages_per_compute_block,
            int8_matmul=False,
            return_lse=return_lse, interpret=interpret)

    explicit_ppcb = pages_per_compute_block is not None
    ppcb = pages_per_compute_block or get_tile_config(
        head_dim=d, seq=max_pages * page_size).pages_per_compute_block
    ppcb = min(ppcb, max_pages)
    # The double-buffered all-heads slabs live in VMEM at
    # 2 slots x 2 pools x Hkv x ppcb x page x D x itemsize: clamp the
    # TABLE-DERIVED ppcb to a ~6MB envelope (the fused kernel's
    # _KV_BUF_BUDGET analog).  An explicitly passed value is honored
    # as-is — silently halving it would corrupt tuning sweeps (Mosaic
    # fails loudly on a genuine VMEM overflow).
    if not explicit_ppcb:
        slab_bytes = hkv * page_size * d * k_pages.dtype.itemsize * 4
        while ppcb > 1 and slab_bytes * ppcb > 6 * 1024 * 1024:
            ppcb //= 2
    # pad block table columns to a multiple of ppcb
    if max_pages % ppcb != 0:
        pad = ppcb - max_pages % ppcb
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        max_pages += pad
    n_blocks = max_pages // ppcb

    # Mosaic has no mixed-dtype matmul: align q to the pool dtype (q is
    # tiny; the pools are not).
    if not quantized and q.dtype != k_pages.dtype:
        q = q.astype(k_pages.dtype)

    d_true = d
    if not interpret and d % NUM_LANES != 0:
        # Mosaic DMA slices must be lane-aligned in the minor dim; the
        # compat path pads per call (a pool copy — callers who care hold
        # the cache in the fused layout, which stores padded natively).
        d = _round_up_lanes(d)
        pad = [(0, 0)] * 3 + [(0, d - d_true)]
        k_pages = jnp.pad(k_pages, pad)
        v_pages = jnp.pad(v_pages, pad)
        q = jnp.pad(q, [(0, 0), (0, 0), (0, d - d_true)])

    # group q heads per kv head; pad group dim UP TO A MULTIPLE of the
    # sublane width (the kernel slices scratch at sublane offsets h*gp,
    # which Mosaic requires 8-aligned — gp=max(8, group) would break at
    # e.g. group=12)
    gp = -(-max(MIN_GROUP_PAD, group) // MIN_GROUP_PAD) * MIN_GROUP_PAD
    qg = q.reshape(batch, hkv, group, d)
    if gp != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - group), (0, 0)))

    rows = hkv * gp
    in_specs = [
        pl.BlockSpec((1, hkv, gp, d), lambda b, i, *_: (b, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args = [qg, k_pages, v_pages]
    scratch = [
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),
        pltpu.VMEM((rows, NUM_LANES), jnp.float32),
        pltpu.VMEM((rows, d), jnp.float32),
        pltpu.VMEM((rows, ppcb * page_size), jnp.float32),
        pltpu.VMEM((2, hkv, ppcb, page_size, d), k_pages.dtype),
        pltpu.VMEM((2, hkv, ppcb, page_size, d), v_pages.dtype),
    ]
    sems = [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args += [k_scales, v_scales]
        scratch += [
            pltpu.VMEM((2, hkv, ppcb, page_size), jnp.float32),
            pltpu.VMEM((2, hkv, ppcb, page_size), jnp.float32),
        ]
        sems += [pltpu.SemaphoreType.DMA((2,)),
                 pltpu.SemaphoreType.DMA((2,))]

    from ..config import decode_xbatch
    cross_batch = decode_xbatch()
    if cross_batch:
        # the slot-parity baton unpacks LAST in the kernel (rest.pop())
        sems.append(pltpu.SMEM((1,), jnp.int32))

    out_specs = [
        pl.BlockSpec((1, hkv, gp, d), lambda b, i, *_: (b, 0, 0, 0)),
    ]
    out_shape = [jax.ShapeDtypeStruct((batch, hkv, gp, d), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec((1, hkv, gp, NUM_LANES),
                                      lambda b, i, *_: (b, 0, 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((batch, hkv, gp, NUM_LANES), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch + sems,
    )

    kernel = functools.partial(
        _paged_decode_kernel,
        hkv=hkv, page_size=page_size, ppcb=ppcb, n_blocks=n_blocks,
        scale=float(scale), window=window, max_pages=max_pages,
        quantized=quantized, return_lse=return_lse,
        nbatch=batch, cross_batch=cross_batch,
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
      *args)

    out = results[0][:, :, :group, :d_true].reshape(batch, hq, d_true)
    if return_lse:
        lse = results[1][:, :, :group, 0].reshape(batch, hq)
        return out, lse
    return out


# ---------------------------------------------------------------------------
# KV cache append ops (the reference's copy_kv_to_paged.comp scatter,
# here XLA scatters — one fused op, no kernel needed)
# ---------------------------------------------------------------------------

def kv_cache_append_decode(
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    k_new: jnp.ndarray,   # [B, Hkv, D] — one token per sequence
    v_new: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, max_pages]
    context_lens: jnp.ndarray,  # [B] length BEFORE append
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter one new token per sequence into the pools.

    Returns (k_pages, v_pages, new_context_lens).  Donated-in-place under
    jit when the caller passes the pools as donated args.
    """
    page_size = k_pages.shape[2]
    batch = k_new.shape[0]
    slot = context_lens % page_size
    logical_page = context_lens // page_size
    phys = block_tables[jnp.arange(batch), logical_page]
    phys = jnp.maximum(phys, 0)
    # [Hkv, B, D] scatter into [Hkv, num_pages, page, D]
    k_pages = k_pages.at[:, phys, slot].set(jnp.swapaxes(k_new, 0, 1))
    v_pages = v_pages.at[:, phys, slot].set(jnp.swapaxes(v_new, 0, 1))
    return k_pages, v_pages, context_lens + 1


def kv_cache_append_decode_quantized(
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    k_scales: jnp.ndarray,   # [Hkv, num_pages, page_size] f32
    v_scales: jnp.ndarray,
    k_new: jnp.ndarray,      # [B, Hkv, D] full-precision new token
    v_new: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
):
    """Quantize one new token per sequence and scatter payload + scales."""
    from .quant import quantize_kv

    page_size = k_pages.shape[2]
    batch = k_new.shape[0]
    kq, ks = quantize_kv(k_new, k_pages.dtype)   # [B,Hkv,D], [B,Hkv]
    vq, vs = quantize_kv(v_new, v_pages.dtype)
    slot = context_lens % page_size
    phys = jnp.maximum(
        block_tables[jnp.arange(batch), context_lens // page_size], 0)
    k_pages = k_pages.at[:, phys, slot].set(jnp.swapaxes(kq, 0, 1))
    v_pages = v_pages.at[:, phys, slot].set(jnp.swapaxes(vq, 0, 1))
    k_scales = k_scales.at[:, phys, slot].set(jnp.swapaxes(ks, 0, 1))
    v_scales = v_scales.at[:, phys, slot].set(jnp.swapaxes(vs, 0, 1))
    return k_pages, v_pages, k_scales, v_scales, context_lens + 1


def _prefill_scatter_coords(batch, seq, page_size, block_tables,
                            context_lens, seq_lens):
    """(phys_flat, slot_flat, valid_flat) coords for a prefill scatter."""
    pos = context_lens[:, None] + jnp.arange(seq)[None, :]      # [B, S]
    valid = jnp.arange(seq)[None, :] < seq_lens[:, None]
    phys = jnp.take_along_axis(block_tables, pos // page_size, axis=1)
    phys = jnp.maximum(phys, 0)
    bsz = batch * seq
    return (phys.reshape(bsz), (pos % page_size).reshape(bsz),
            valid.reshape(bsz))


def _masked_pool_scatter(pool, values, phys_f, slot_f, valid_f):
    """Scatter values [B*S, Hkv, ...] into pool [Hkv, P, page, ...] with
    invalid tokens keeping the existing pool contents (read-modify-write —
    no dummy page needed)."""
    old = jnp.swapaxes(pool[:, phys_f, slot_f], 0, 1)
    mask_shape = (valid_f.shape[0],) + (1,) * (values.ndim - 1)
    vals = jnp.where(valid_f.reshape(mask_shape), values, old)
    return pool.at[:, phys_f, slot_f].set(jnp.swapaxes(vals, 0, 1))


def kv_cache_append_prefill(
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    k_new: jnp.ndarray,   # [B, Hkv, S, D]
    v_new: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,  # [B] lengths BEFORE append (token offsets)
    seq_lens: jnp.ndarray,      # [B] number of valid new tokens (<= S)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter a batch of prefill sequences into the pools.

    Tokens beyond seq_lens[b] are dropped (masked read-modify-write).
    """
    batch, hkv, seq, d = k_new.shape
    phys_f, slot_f, valid_f = _prefill_scatter_coords(
        batch, seq, k_pages.shape[2], block_tables, context_lens, seq_lens)
    bsz = batch * seq
    kf = jnp.swapaxes(k_new, 1, 2).reshape(bsz, hkv, d)   # [B*S, Hkv, D]
    vf = jnp.swapaxes(v_new, 1, 2).reshape(bsz, hkv, d)
    k_pages = _masked_pool_scatter(k_pages, kf, phys_f, slot_f, valid_f)
    v_pages = _masked_pool_scatter(v_pages, vf, phys_f, slot_f, valid_f)
    return k_pages, v_pages, context_lens + seq_lens


def kv_cache_append_prefill_quantized(
    k_pages: jnp.ndarray,       # int8/fp8 pools
    v_pages: jnp.ndarray,
    k_scales: jnp.ndarray,      # [Hkv, P, page] f32
    v_scales: jnp.ndarray,
    k_new: jnp.ndarray,         # [B, Hkv, S, D] full precision
    v_new: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    seq_lens: jnp.ndarray,
):
    """Quantize prefill K/V per token and scatter payloads + scales."""
    from .quant import quantize_kv

    batch, hkv, seq, d = k_new.shape
    phys_f, slot_f, valid_f = _prefill_scatter_coords(
        batch, seq, k_pages.shape[2], block_tables, context_lens, seq_lens)
    bsz = batch * seq
    kq, ks = quantize_kv(k_new, k_pages.dtype)   # payload + [B,Hkv,S]
    vq, vs = quantize_kv(v_new, v_pages.dtype)
    k_pages = _masked_pool_scatter(
        k_pages, jnp.swapaxes(kq, 1, 2).reshape(bsz, hkv, d),
        phys_f, slot_f, valid_f)
    v_pages = _masked_pool_scatter(
        v_pages, jnp.swapaxes(vq, 1, 2).reshape(bsz, hkv, d),
        phys_f, slot_f, valid_f)
    k_scales = _masked_pool_scatter(
        k_scales, jnp.swapaxes(ks, 1, 2).reshape(bsz, hkv),
        phys_f, slot_f, valid_f)
    v_scales = _masked_pool_scatter(
        v_scales, jnp.swapaxes(vs, 1, 2).reshape(bsz, hkv),
        phys_f, slot_f, valid_f)
    return (k_pages, v_pages, k_scales, v_scales,
            context_lens + seq_lens)
