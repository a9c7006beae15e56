"""Gravity attention: top-k sparse attention over high-magnitude keys.

TPU-native re-design of the reference's experimental "gravity" path
(SURVEY.md §3.6): the 3-shader segmented radix sort pipeline
(sort_pipeline.zig, radix_*.comp) collapses into `jax.lax.top_k` /
`jnp.argsort` (XLA has native sorts), and the indirect-attention shader
(attention_gravity.comp) becomes a gather + dense attention where causal /
window masks are applied to the ORIGINAL key positions
(attention_gravity.comp:138-151 semantics).  Heuristic matches
magnitude_sort.comp:3-5: high-|k| keys produce the largest logits, so
attending to the top `max_attend` of them approximates full attention.

Unlike the reference's global sort (which mixes batches when B*H > 1,
attention_gpu.zig:252-257 — a bug we do not replicate), argsort here is
inherently segmented per (batch, head).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .reference import NEG_INF
from .rope import apply_rope


def spatial_sort(k: jnp.ndarray, descending: bool = True) -> jnp.ndarray:
    """Indices of keys sorted by squared magnitude per (batch, head).

    k: [B, H, S, D] -> int32 [B, H, S].  Replaces the reference's
    iota -> magnitude -> 4-pass radix pipeline (sort_pipeline.zig:354-472).
    """
    mag = jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)
    order = jnp.argsort(-mag if descending else mag, axis=-1)
    return order.astype(jnp.int32)


def gravity_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    max_attend: int,
    indices: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
    rope_cos=None,
    rope_sin=None,
    chunk_size: Optional[int] = None,
) -> jnp.ndarray:
    """Attention truncated to the top `max_attend` keys by magnitude.

    Mirrors the reference contract (vulkan.py:1023-1140): `indices` may be
    pre-sorted (from spatial_sort) or computed internally; RoPE rotates by
    ORIGINAL positions; causal/window masks compare against ORIGINAL key
    positions.  Compute is O(Sq * max_attend) instead of O(Sq * Sk), and
    the selected keys are walked in `chunk_size` chunks (default 512)
    with an online softmax, so memory is O(Sq * chunk) instead of
    O(Sq * max_attend).
    """
    batch, hq, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    group = hq // hkv
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    max_attend = min(max_attend, sk)

    if rope_cos is not None:
        q = apply_rope(q.astype(jnp.float32), rope_cos, rope_sin)
        k = apply_rope(k.astype(jnp.float32), rope_cos, rope_sin)

    if indices is None:
        mag = jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)
        sel = jax.lax.top_k(mag, max_attend)[1]          # [B, Hkv, A]
    else:
        sel = indices[..., :max_attend].astype(jnp.int32)
    sel = sel.astype(jnp.int32)

    # Flash-style chunked walk over the selected keys (lax.scan with an
    # online softmax): peak memory is O(R * chunk) scores + the gathered
    # [B,Hkv,chunk,D] K/V tiles, NOT the r2 dense [B,Hq,Sq,A] f32 score
    # tensor + group-expanded gathers (VERDICT r2 weak #9) — at the
    # advertised 32k/needle scale the dense form was an O(Sq*A) HBM hog.
    # The GQA group folds into extra q ROWS per kv head (exact: the
    # gathered K/V are shared across the group), replacing jnp.repeat.
    a_total = max_attend
    chunk = min(a_total, int(chunk_size) if chunk_size else 512)
    a_pad = -(-a_total // chunk) * chunk
    if a_pad != a_total:
        sel = jnp.pad(sel, ((0, 0), (0, 0), (0, a_pad - a_total)))
    n_chunks = a_pad // chunk

    qf = (q.astype(jnp.float32)
          .reshape(batch, hkv, group * sq, d))            # rows=(g, qpos)
    kf, vf = k, v  # cast AFTER the gather: only chunks hit f32
    q_pos = (jnp.arange(group * sq) % sq)[None, None, :, None]

    sel_chunks = jnp.moveaxis(
        sel.reshape(batch, hkv, n_chunks, chunk), 2, 0)   # [n,B,Hkv,c]
    col_offsets = jnp.arange(n_chunks) * chunk

    def body(carry, xs):
        m, l, acc = carry
        sel_c, off = xs
        kg = jnp.take_along_axis(
            kf, sel_c[..., None], axis=2).astype(jnp.float32)
        vg = jnp.take_along_axis(
            vf, sel_c[..., None], axis=2).astype(jnp.float32)
        s = jnp.einsum("bhrd,bhcd->bhrc", qf, kg,
                       precision=jax.lax.Precision.HIGHEST) * scale
        k_pos = sel_c[:, :, None, :]                      # original index
        valid = ((off + jnp.arange(chunk)) < a_total)[
            None, None, None, :]
        mask = jnp.broadcast_to(valid, s.shape)
        if causal:
            mask = mask & (q_pos >= k_pos)
        if window_size is not None and window_size > 0:
            mask = mask & ((q_pos - k_pos) <= window_size)
            if not causal:
                mask = mask & ((k_pos - q_pos) <= window_size)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        shift = jnp.where(m_new > NEG_INF * 0.5, m_new, 0.0)
        p = jnp.exp(s - shift)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(jnp.where(m > NEG_INF * 0.5, m, shift) - shift)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhrc,bhcd->bhrd", p, vg,
            precision=jax.lax.Precision.HIGHEST)
        return (m_new, l, acc), None

    rows = group * sq
    init = (
        jnp.full((batch, hkv, rows, 1), NEG_INF, jnp.float32),
        jnp.zeros((batch, hkv, rows, 1), jnp.float32),
        jnp.zeros((batch, hkv, rows, d), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, (sel_chunks, col_offsets))
    out = acc / jnp.where(l == 0, 1.0, l)
    return out.reshape(batch, hq, sq, d).astype(q.dtype)
