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
) -> jnp.ndarray:
    """Attention truncated to the top `max_attend` keys by magnitude.

    Mirrors the reference contract (vulkan.py:1023-1140): `indices` may be
    pre-sorted (from spatial_sort) or computed internally; RoPE rotates by
    ORIGINAL positions; causal/window masks compare against ORIGINAL key
    positions.  Compute is O(Sq * max_attend) instead of O(Sq * Sk).
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

    kg = jnp.take_along_axis(k, sel[..., None], axis=2)   # [B, Hkv, A, D]
    vg = jnp.take_along_axis(v, sel[..., None], axis=2)
    if group > 1:
        kg = jnp.repeat(kg, group, axis=1)
        vg = jnp.repeat(vg, group, axis=1)
        sel_q = jnp.repeat(sel, group, axis=1)            # [B, Hq, A]
    else:
        sel_q = sel

    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   kg.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * scale

    q_pos = jnp.arange(sq)[None, None, :, None]
    k_pos = sel_q[:, :, None, :]                          # original indices
    mask = jnp.ones(s.shape, bool)
    if causal:
        mask &= q_pos >= k_pos
    if window_size is not None and window_size > 0:
        mask &= (q_pos - k_pos) <= window_size
        if not causal:
            mask &= (k_pos - q_pos) <= window_size
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    row_valid = m > NEG_INF * 0.5
    p = jnp.exp(s - jnp.where(row_valid, m, 0.0))
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p / jnp.where(l == 0, 1.0, l),
                     vg.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(q.dtype)
