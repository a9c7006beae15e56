"""Mesh-sharded attention: head-parallel, context-parallel, ring attention.

Entirely net-new vs the single-device reference (SURVEY.md §2.4): scaling on
TPU comes from jax.shard_map over a Mesh with XLA collectives on ICI, not
from a NCCL-like layer.  Four strategies, composable over a 2-D/3-D mesh:

  * head parallelism ('model' axis): Q and KV heads co-located per chip
    (GQA-friendly); zero communication inside attention.
  * context parallelism ('ctx' axis): KV sequence/pages sharded; each chip
    computes a partial (o, lse) against its shard, merged with the
    cross-shard softmax combine (parallel/collectives.py).
  * ring attention ('ctx' axis, causal-aware): KV chunks rotate via
    jax.lax.ppermute while each chip computes; comm overlaps compute, and
    causal chunk relations decompose into {skip, diagonal, full} so
    off-diagonal chunks run the kernel with masking disabled.
  * Ulysses sequence parallelism ('ctx' axis): all-to-alls trade the
    sequence sharding for head sharding around an exact full-sequence
    local kernel; comm is O(B·H·S·D/n), mask-structure-free.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.flash import DEFAULT_MASK_VALUE, flash_attention_fwd
from ..ops.flash_vjp import flash_attention_lse, flash_attention_vjp
from ..ops.paged import paged_attention
from .collectives import softmax_combine_allreduce, softmax_combine_pair

try:  # jax >= 0.5 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


# ---------------------------------------------------------------------------
# head-parallel (+ data-parallel batch) prefill/training attention
# ---------------------------------------------------------------------------

def make_head_parallel_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
    data_axis: str = "data",
    model_axis: str = "model",
    shard_kv_heads: bool = True,
):
    """shard_map'd flash attention with heads on `model`, batch on `data`.

    With GQA, KV heads shard on the same axis when divisible (co-located
    with their Q-head group: zero comms); otherwise KV is replicated.
    Differentiable (wraps the custom_vjp core).
    """
    kv_spec = (P(data_axis, model_axis, None, None) if shard_kv_heads
               else P(data_axis, None, None, None))

    def local_fn(q, k, v):
        return flash_attention_vjp(
            q, k, v, causal=causal, scale=scale, window_size=window_size)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(data_axis, model_axis, None, None), kv_spec, kv_spec),
        out_specs=P(data_axis, model_axis, None, None),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# context-parallel attention: KV sequence sharded, cross-shard combine
# ---------------------------------------------------------------------------

def make_context_parallel_attention(
    mesh: Mesh,
    *,
    scale: Optional[float] = None,
    ctx_axis: str = "ctx",
):
    """Non-causal attention with KV sharded along `ctx_axis`.

    Q is replicated along ctx; each chip computes a partial (o, lse) over
    its KV shard and the results merge via pmax+psum — O(D) bytes exchanged
    per query instead of the KV shard (boom guide §15, approach 2).

    Differentiable end-to-end: the local core is the custom_vjp
    (out, lse) flash op — its backward folds the lse cotangent into the
    delta term — and the combine's psum is linear (the pmax shift is
    stop_gradient'ed, exact because the combine is shift-invariant).
    dq merges across shards through the combine's psum transpose; dk/dv
    stay local to each shard, which is exactly the context-parallel
    backward dataflow.
    """

    def local_fn(q, k, v):
        o, lse = flash_attention_lse(q, k, v, causal=False, scale=scale)
        o, _ = softmax_combine_allreduce(
            o.astype(jnp.float32), lse, ctx_axis)
        return o.astype(q.dtype)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, None, None),
                  P(None, None, ctx_axis, None),
                  P(None, None, ctx_axis, None)),
        out_specs=P(None, None, None, None),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# ring attention: causal context parallelism with rotating KV chunks
# ---------------------------------------------------------------------------

def _ring_attention_local(q, k, v, *, axis_name: str, causal: bool,
                          scale: Optional[float]):
    """Per-device body: rotate KV around the ring, merge partials.

    q: local query shard [B, Hq, Sq/N, D] (sharded along the same axis);
    k, v: local KV shards.  Causal chunk classification (boom guide §16):
    a KV chunk from source shard s vs queries on shard i is
      s == i -> diagonal (local causal mask is exactly the global one)
      s <  i -> fully visible (no mask)
      s >  i -> fully masked (skip; contributes -inf lse)
    """
    n = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def diag(args):
        q, kc, vc = args
        return flash_attention_lse(q, kc, vc, causal=True, scale=scale)

    def full(args):
        q, kc, vc = args
        return flash_attention_lse(q, kc, vc, causal=False, scale=scale)

    def skip(args):
        q, kc, vc = args
        b, h, sq, d = q.shape
        return (jnp.zeros(q.shape, jnp.float32),
                jnp.full((b, h, sq), DEFAULT_MASK_VALUE, jnp.float32))

    def step(carry, t):
        o, lse, kc, vc = carry
        src = jax.lax.rem(me - t + n, n)
        if causal:
            branch = jnp.where(src == me, 0, jnp.where(src < me, 1, 2))
            o_t, lse_t = jax.lax.switch(branch, [diag, full, skip],
                                        (q, kc, vc))
        else:
            o_t, lse_t = full((q, kc, vc))
        o_t = o_t.astype(jnp.float32)
        o, lse = softmax_combine_pair(o, lse, o_t, lse_t)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o, lse, kc, vc), None

    b, h, sq, d = q.shape
    o0 = jnp.zeros((b, h, sq, d), jnp.float32)
    lse0 = jnp.full((b, h, sq), DEFAULT_MASK_VALUE, jnp.float32)
    (o, lse, _, _), _ = jax.lax.scan(
        step, (o0, lse0, k, v), jnp.arange(n))
    return o.astype(q.dtype)


def make_ring_attention(
    mesh: Mesh,
    *,
    causal: bool = True,
    scale: Optional[float] = None,
    ctx_axis: str = "ctx",
):
    """Ring attention over `ctx_axis`: Q and KV both sequence-sharded.

    Point-to-point ppermute rotates KV chunks; each hop overlaps the local
    flash kernel.  Total bytes moved equal one all-gather but are hidden
    behind compute when Sq/N is large (boom guide §16).

    Differentiable: each hop's kernel is the custom_vjp (out, lse) flash
    core, the pairwise combine stop_gradient's its shift (exact —
    shift-invariant), and scan/ppermute/switch transpose natively; the
    backward rotates KV cotangents back around the ring.
    """
    local = functools.partial(
        _ring_attention_local, axis_name=ctx_axis, causal=causal,
        scale=scale)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, ctx_axis, None),
                  P(None, None, ctx_axis, None),
                  P(None, None, ctx_axis, None)),
        out_specs=P(None, None, ctx_axis, None),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Ulysses sequence parallelism: all-to-all head<->sequence re-sharding
# ---------------------------------------------------------------------------

def make_ulysses_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
    seq_axis: str = "ctx",
):
    """Ulysses-style (DeepSpeed) sequence parallelism over `seq_axis`.

    q/k/v arrive SEQUENCE-sharded ([B, H, S/n, D] per chip, the natural
    layout coming out of sequence-sharded MLP/activations); one
    all-to-all per operand re-shards HEADS over the axis while gathering
    the full sequence ([B, H/n, S, D]), the local kernel runs exact
    full-sequence attention — causal and sliding-window masks need no
    ring-style chunk decomposition — and a final all-to-all restores
    sequence sharding on the output.

    The trade vs ring attention (SURVEY §2.4 net-new; both absent in
    the single-device reference): Ulysses moves 4·B·H·S·D/n bytes per
    chip in four dense all-to-alls (ICI-friendly, independent of any
    causal structure) but caps the axis size at the head count;
    ring attention keeps heads whole and hides KV rotation behind
    compute.  Use Ulysses when n <= Hkv and the masks are complex;
    ring when heads are few or S/n is large enough to hide the hops.

    Differentiable end-to-end: all_to_all is linear (its transpose is
    the reverse all_to_all) and the local core is the custom_vjp flash
    op, so jax.grad sees the exact backward dataflow.
    """
    n = mesh.shape[seq_axis]

    def local_fn(q, k, v):
        def a2a_in(x):   # [B, h, S/n, D] -> [B, h/n, S, D]
            return jax.lax.all_to_all(x, seq_axis, split_axis=1,
                                      concat_axis=2, tiled=True)

        o = flash_attention_vjp(
            a2a_in(q), a2a_in(k), a2a_in(v), causal=causal, scale=scale,
            window_size=window_size)
        # [B, H/n, S, D] -> [B, H, S/n, D]
        return jax.lax.all_to_all(o, seq_axis, split_axis=2,
                                  concat_axis=1, tiled=True)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, None, seq_axis, None),
                  P(None, None, seq_axis, None),
                  P(None, None, seq_axis, None)),
        out_specs=P(None, None, seq_axis, None),
        check_vma=False,
    )
    jfn = jax.jit(fn)

    def checked(q, k, v):
        if q.shape[1] % n or k.shape[1] % n:
            raise ValueError(
                f"ulysses requires head counts divisible by the axis: "
                f"Hq={q.shape[1]}, Hkv={k.shape[1]}, |{seq_axis}|={n} "
                f"(use ring/context parallelism when heads don't split)")
        if q.shape[2] % n or k.shape[2] % n:
            raise ValueError(
                f"sequence lengths must divide the axis for the "
                f"all-to-all: Sq={q.shape[2]}, Sk={k.shape[2]}, n={n}")
        return jfn(q, k, v)

    return checked


# ---------------------------------------------------------------------------
# sharded paged decode: heads on `model`, pages on `ctx`, batch on `data`
# ---------------------------------------------------------------------------

def make_sharded_paged_attention(
    mesh: Mesh,
    *,
    scale: Optional[float] = None,
    data_axis: Optional[str] = "data",
    model_axis: Optional[str] = "model",
    ctx_axis: Optional[str] = None,
    pages_per_compute_block: Optional[int] = None,
):
    """Mesh-sharded paged decode (the BASELINE.json multi-chip serving path).

    Shardings:
      q            [B, Hq, D]                 P(data, model, None)
      k/v_pages    [Hkv, num_pages, page, D]  P(model, ctx, None, None)
      block_tables [B, n_ctx, max_pages]      P(data, ctx, None)
      context_lens [B, n_ctx]                 P(data, ctx)

    With ctx sharding, each chip holds a slice of every sequence's pages
    (the caller distributes pages round-robin and builds per-shard tables /
    lengths); partial (o, lse) merge over `ctx_axis` with pmax+psum.
    Heads shard over `model` with their GQA groups; batch shards over
    `data` (continuous batching across hosts).
    """
    axes = [a for a in (data_axis, model_axis, ctx_axis) if a]
    for a in axes:
        if a not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {a!r}")

    def local_fn(q, k_pages, v_pages, block_tables, context_lens):
        bt = block_tables.reshape(
            block_tables.shape[0], block_tables.shape[2])
        lens = context_lens.reshape(-1)
        if ctx_axis is None:
            return paged_attention(
                q, k_pages, v_pages, bt, lens, scale=scale,
                pages_per_compute_block=pages_per_compute_block)
        o, lse = paged_attention(
            q, k_pages, v_pages, bt, lens, scale=scale,
            pages_per_compute_block=pages_per_compute_block,
            return_lse=True)
        o, _ = softmax_combine_allreduce(o, lse, ctx_axis)
        return o

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(data_axis, model_axis, None),
                  P(model_axis, ctx_axis, None, None),
                  P(model_axis, ctx_axis, None, None),
                  P(data_axis, ctx_axis, None),
                  P(data_axis, ctx_axis)),
        out_specs=P(data_axis, model_axis, None),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_paged_attention_fused(
    mesh: Mesh,
    *,
    scale: Optional[float] = None,
    data_axis: Optional[str] = "data",
    model_axis: Optional[str] = None,
    ctx_axis: Optional[str] = None,
    quantized: bool = False,
    pages_per_compute_block: Optional[int] = None,
):
    """Sharded paged decode over FUSED-layout pools (the serving fast path:
    one DMA per page spanning K+V and all kv heads, ops/paged_fused.py).

    Mesh axes: batch (`data`, continuous batching across hosts),
    pages/context (`ctx`, long sequences striped over chips with per-shard
    block tables + lengths, merged via the cross-shard softmax combine),
    and kv heads (`model`, tensor parallel): the pool's head dim shards so
    each shard's pages stay fully-local fused slabs [P, 2, Hkv/tp, page,
    D] and the kernel runs unchanged per shard.

    Shardings:
      q            [B, Hq, D]              P(data, model, None)
      kv_pages     [P, 2, Hkv, page, D]    P(ctx, None, model, None, None)
      block_tables [B, n_ctx, max_pages]   P(data, ctx, None)
      context_lens [B, n_ctx]              P(data, ctx)
      kv_scales    [P, page, tp*128]       P(ctx, None, model)  (quantized;
                   each shard's 128-lane block packs its LOCAL heads —
                   ops/paged_fused.fused_scales_shape)
    """
    from ..ops.paged_fused import paged_attention_fused

    axes = [a for a in (data_axis, model_axis, ctx_axis) if a]
    for a in axes:
        if a not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {a!r}")

    def local_fn(q, kv_pages, block_tables, context_lens, *maybe_scales):
        sc = maybe_scales[0] if quantized else None
        bt = block_tables.reshape(
            block_tables.shape[0], block_tables.shape[2])
        lens = context_lens.reshape(-1)
        if ctx_axis is None:
            return paged_attention_fused(
                q, kv_pages, bt, lens, kv_scales=sc, scale=scale,
                pages_per_compute_block=pages_per_compute_block)
        o, lse = paged_attention_fused(
            q, kv_pages, bt, lens, kv_scales=sc, scale=scale,
            pages_per_compute_block=pages_per_compute_block,
            return_lse=True)
        o, _ = softmax_combine_allreduce(o, lse, ctx_axis)
        return o

    in_specs = [P(data_axis, model_axis, None),
                P(ctx_axis, None, model_axis, None, None),
                P(data_axis, ctx_axis, None),
                P(data_axis, ctx_axis)]
    if quantized:
        in_specs.append(P(ctx_axis, None, model_axis))

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(data_axis, model_axis, None),
        check_vma=False,
    )
    return jax.jit(fn)
