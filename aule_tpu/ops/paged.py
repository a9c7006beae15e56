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


def _paged_decode_kernel(
    # scalar prefetch
    ctx_ref,      # [B] int32
    bt_ref,       # [B, max_pages] int32
    # inputs
    q_ref,        # [1, 1, Gp, D] VMEM
    k_hbm,        # [Hkv, num_pages, page, D] ANY/HBM
    v_hbm,
    # outputs
    o_ref,        # [1, 1, Gp, D] VMEM
    # scratch
    m_scr, l_scr, acc_scr,
    k_buf, v_buf,            # [2, ppcb, page, D] VMEM
    k_sem, v_sem,            # DMA sems [2]
    *,
    page_size: int,
    ppcb: int,               # pages per compute block
    n_blocks: int,
    scale: float,
    window: int,
    max_pages: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)

    length = ctx_ref[b]
    tokens_per_block = page_size * ppcb
    n_live = pl.cdiv(length, tokens_per_block)

    def start_dma(block_idx, slot):
        """Start per-page DMAs for one compute block into buffer `slot`."""
        for p in range(ppcb):
            page_id = bt_ref[b, block_idx * ppcb + p]
            page_id = jnp.maximum(page_id, 0)  # -1 sentinel -> page 0
            pltpu.make_async_copy(
                k_hbm.at[h, page_id], k_buf.at[slot, p], k_sem.at[slot]
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[h, page_id], v_buf.at[slot, p], v_sem.at[slot]
            ).start()

    def wait_dma(slot):
        for p in range(ppcb):
            pltpu.make_async_copy(
                k_hbm.at[h, 0], k_buf.at[slot, p], k_sem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[h, 0], v_buf.at[slot, p], v_sem.at[slot]
            ).wait()

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

        @pl.when(n_live > 0)
        def _():
            start_dma(0, 0)

    @pl.when(i < n_live)
    def _compute():
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_live)
        def _prefetch():
            start_dma(i + 1, 1 - slot)

        wait_dma(slot)

        q = q_ref[0, 0].astype(jnp.float32)  # [Gp, D]
        k = k_buf[slot].reshape(tokens_per_block, -1).astype(jnp.float32)
        v = v_buf[slot].reshape(tokens_per_block, -1).astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Gp, tokens_per_block]

        pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + i * tokens_per_block
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

        acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == n_blocks - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def paged_attention(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    window_size: int = -1,
    pages_per_compute_block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Paged decode attention (one query token per sequence).

    See module docstring for the cache contract.  Window semantics: only the
    trailing `window_size` tokens of each context are visible
    (triton_flash_amd.py:617-621 behavior).
    """
    batch, hq, d = q.shape
    hkv, num_pages, page_size, _ = k_pages.shape
    group = hq // hkv
    max_pages = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    window = int(window_size) if window_size and window_size > 0 else -1

    ppcb = pages_per_compute_block or get_tile_config().pages_per_compute_block
    ppcb = min(ppcb, max_pages)
    # pad block table columns to a multiple of ppcb
    if max_pages % ppcb != 0:
        pad = ppcb - max_pages % ppcb
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        max_pages += pad
    n_blocks = max_pages // ppcb

    # group q heads per kv head; pad group dim to the sublane width
    gp = max(MIN_GROUP_PAD, group)
    qg = q.reshape(batch, hkv, group, d)
    if gp != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - group), (0, 0)))

    if interpret is None:
        interpret = get_config().interpret or (
            jax.devices()[0].platform != "tpu"
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, hkv, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, gp, d), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, gp, d), lambda b, h, i, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((gp, NUM_LANES), jnp.float32),
            pltpu.VMEM((gp, NUM_LANES), jnp.float32),
            pltpu.VMEM((gp, d), jnp.float32),
            pltpu.VMEM((2, ppcb, page_size, d), k_pages.dtype),
            pltpu.VMEM((2, ppcb, page_size, d), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _paged_decode_kernel,
        page_size=page_size, ppcb=ppcb, n_blocks=n_blocks,
        scale=float(scale), window=window, max_pages=max_pages,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, hkv, gp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(context_lens.astype(jnp.int32), block_tables.astype(jnp.int32),
      qg, k_pages, v_pages)

    out = out[:, :, :group].reshape(batch, hq, d)
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

    Tokens beyond seq_lens[b] are dropped (scattered to a scratch page 0
    guard is avoided by clamping to the last valid slot and masking via
    out-of-range physical page handling below).
    """
    batch, hkv, seq, d = k_new.shape
    page_size = k_pages.shape[2]
    pos = context_lens[:, None] + jnp.arange(seq)[None, :]      # [B, S]
    valid = jnp.arange(seq)[None, :] < seq_lens[:, None]
    logical_page = pos // page_size
    slot = pos % page_size
    phys = jnp.take_along_axis(block_tables, logical_page, axis=1)
    phys = jnp.maximum(phys, 0)
    # route invalid tokens to a dummy write at page index num_pages-? ->
    # instead mask by scattering the existing value (read-modify-write)
    bsz = batch * seq
    phys_f = phys.reshape(bsz)
    slot_f = slot.reshape(bsz)
    kf = jnp.swapaxes(k_new, 1, 2).reshape(bsz, hkv, d)   # [B*S, Hkv, D]
    vf = jnp.swapaxes(v_new, 1, 2).reshape(bsz, hkv, d)
    valid_f = valid.reshape(bsz)
    old_k = jnp.swapaxes(k_pages[:, phys_f, slot_f], 0, 1)  # [B*S, Hkv, D]
    old_v = jnp.swapaxes(v_pages[:, phys_f, slot_f], 0, 1)
    kf = jnp.where(valid_f[:, None, None], kf, old_k)
    vf = jnp.where(valid_f[:, None, None], vf, old_v)
    k_pages = k_pages.at[:, phys_f, slot_f].set(jnp.swapaxes(kf, 0, 1))
    v_pages = v_pages.at[:, phys_f, slot_f].set(jnp.swapaxes(vf, 0, 1))
    return k_pages, v_pages, context_lens + seq_lens
