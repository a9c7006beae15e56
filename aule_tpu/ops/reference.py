"""Dense-math reference attention — test oracle and CPU/XLA fallback backend.

Plays two roles mirrored from the reference library:
  * the NumPy CPU fallback (`_cpu_attention`, python/aule/__init__.py:247-271
    and src/attention_ref.zig:18-171), and
  * the pure-XLA backend (an einsum-softmax that XLA fuses on TPU), which the
    Pallas kernels are validated against.

Semantics replicated from the reference kernels (behavior, not code):
  * causal mask `q_idx >= k_idx` (triton_flash.py:188-190)
  * sliding window: causal `q - k <= W`; bidirectional `|q - k| <= W`
    (triton_flash.py:191-195)
  * GQA/MQA head mapping `h_kv = h_q // (Hq // Hkv)` (triton_flash.py:90-92)
  * fused RoPE on Q and K, half-split convention (triton_flash.py:115-131)
  * NaN-safe fully-masked rows: output 0, not NaN (triton_flash.py:201-220)
  * LSE = m + log(l) for training (triton_flash.py:230-234)
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .rope import apply_rope

NEG_INF = float(np.finfo(np.float32).min) * 0.5  # avoid -inf - -inf = nan


def build_mask(
    seq_q: int,
    seq_k: int,
    causal: bool = False,
    window_size: int = -1,
    q_offset: int = 0,
    xp=np,
):
    """Boolean [seq_q, seq_k] mask; True = may attend.

    `q_offset` shifts query positions (query i sits at absolute position
    i + q_offset) so the same algebra covers decode steps appended after a
    prefix.  The reference aligns causal masks at zero offset
    (triton_flash.py:188).
    """
    q_idx = xp.arange(seq_q)[:, None] + q_offset
    k_idx = xp.arange(seq_k)[None, :]
    mask = xp.ones((seq_q, seq_k), dtype=bool)
    if causal:
        mask = mask & (q_idx >= k_idx)
    if window_size is not None and window_size > 0:
        mask = mask & ((q_idx - k_idx) <= window_size)
        if not causal:
            mask = mask & ((k_idx - q_idx) <= window_size)
    return mask


def _expand_kv(x, num_q_heads: int):
    """Repeat KV heads to match Q heads for GQA (oracle-side expansion)."""
    num_kv = x.shape[1]
    if num_kv == num_q_heads:
        return x
    group = num_q_heads // num_kv
    return jnp.repeat(x, group, axis=1)


def attention_reference(
    q,
    k,
    v,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
    rope_cos=None,
    rope_sin=None,
    q_offset: int = 0,
    return_lse: bool = False,
    kv_len=None,
    xp=jnp,
):
    """Dense attention over [B, H, S, D] arrays.

    Supports GQA (Hq % Hkv == 0), cross-attention (Sq != Sk), causal and
    sliding-window masks, optional fused RoPE, and is NaN-safe for fully
    masked rows.  Computation in float32 regardless of input dtype.

    kv_len: optional (traced) int32 scalar — only k/v positions < kv_len
    attend (bucket-padded varlen; mirrors flash_attention_fwd's kv_len).
    """
    q = jnp.asarray(q)
    k = jnp.asarray(k)
    v = jnp.asarray(v)
    in_dtype = q.dtype
    batch, num_q_heads, seq_q, head_dim = q.shape
    seq_k = k.shape[2]
    if scale is None:
        scale = 1.0 / float(np.sqrt(head_dim))

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    if rope_cos is not None:
        qf = apply_rope(qf, jnp.asarray(rope_cos, jnp.float32),
                        jnp.asarray(rope_sin, jnp.float32),
                        positions=jnp.arange(seq_q) + q_offset)
        kf = apply_rope(kf, jnp.asarray(rope_cos, jnp.float32),
                        jnp.asarray(rope_sin, jnp.float32))

    kf = _expand_kv(kf, num_q_heads)
    vf = _expand_kv(vf, num_q_heads)

    scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                        precision=jax.lax.Precision.HIGHEST) * scale
    mask = build_mask(seq_q, seq_k, causal, window_size, q_offset, xp=jnp)
    if kv_len is not None:
        mask = jnp.logical_and(mask, jnp.arange(seq_k)[None, :] < kv_len)
    scores = jnp.where(mask[None, None], scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    # fully-masked rows: m == NEG_INF; shift so exp() is exactly 0 there
    row_valid = m > NEG_INF * 0.5
    m_safe = jnp.where(row_valid, m, 0.0)
    p = jnp.exp(scores - m_safe)
    p = jnp.where(mask[None, None], p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = jnp.einsum("bhqk,bhkd->bhqd", p / l_safe, vf,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.astype(in_dtype)
    if return_lse:
        lse = jnp.where(row_valid, m_safe + jnp.log(l_safe), NEG_INF)
        return out, lse[..., 0]
    return out


def attention_reference_numpy(
    q: np.ndarray,
    k: np.ndarray,
    v: np.ndarray,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
    q_offset: int = 0,
    return_lse: bool = False,
) -> np.ndarray:
    """Pure-NumPy oracle, deliberately independent of JAX/XLA.

    Used by tests as the ground truth so the Pallas, XLA and sharded paths
    are all validated against arithmetic that never went through XLA
    (analogous to the reference's attention_ref.zig CPU reference).
    """
    batch, hq, sq, d = q.shape
    hkv = k.shape[1]
    sk = k.shape[2]
    if scale is None:
        scale = 1.0 / float(np.sqrt(d))
    group = hq // hkv
    k = np.repeat(k.astype(np.float64), group, axis=1)
    v = np.repeat(v.astype(np.float64), group, axis=1)
    qf = q.astype(np.float64)
    scores = np.einsum("bhqd,bhkd->bhqk", qf, k) * scale
    mask = build_mask(sq, sk, causal, window_size, q_offset, xp=np)
    scores = np.where(mask[None, None], scores, -np.inf)
    m = np.max(scores, axis=-1, keepdims=True)
    m_safe = np.where(np.isfinite(m), m, 0.0)
    p = np.exp(scores - m_safe)
    p = np.where(mask[None, None], p, 0.0)
    l = np.sum(p, axis=-1, keepdims=True)
    l_safe = np.where(l == 0.0, 1.0, l)
    out = np.einsum("bhqk,bhkd->bhqd", p / l_safe, v).astype(q.dtype)
    if not return_lse:
        return out
    lse = np.where(l[..., 0] > 0.0, m_safe[..., 0] + np.log(l_safe[..., 0]),
                   -0.7 * np.finfo(np.float32).max)
    return out, lse.astype(np.float32)


def paged_attention_reference(
    q,
    k_pages,
    v_pages,
    block_tables,
    context_lens,
    *,
    scale: Optional[float] = None,
    window_size: int = -1,
) -> jnp.ndarray:
    """Dense oracle for paged decode.

    Contract (the Triton-style caller-owned-cache contract the reference's
    production path uses, triton_flash_amd.py:662-737, adapted to the
    TPU-friendly head-major pool layout):
      q:            [B, Hq, D]       one query token per sequence
      k/v_pages:    [Hkv, num_pages, page_size, D]
      block_tables: [B, max_pages]   int32, logical->physical page map
      context_lens: [B]              int32 tokens present per sequence
    Window semantics: only the last `window_size` tokens are visible
    (k position p attends iff context_len - 1 - p < W), matching
    triton_flash_amd.py:617-621.
    """
    q = jnp.asarray(q)
    batch, num_q_heads, head_dim = q.shape
    num_kv_heads, _, page_size, _ = k_pages.shape
    max_pages = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(head_dim))

    # gather per-sequence contiguous K/V: [B, Hkv, max_pages*page, D]
    kg = jnp.swapaxes(k_pages[:, block_tables], 0, 1)  # [B,Hkv,maxp,page,D]
    vg = jnp.swapaxes(v_pages[:, block_tables], 0, 1)
    kg = kg.reshape(batch, num_kv_heads, max_pages * page_size, head_dim)
    vg = vg.reshape(batch, num_kv_heads, max_pages * page_size, head_dim)

    kg = _expand_kv(kg.astype(jnp.float32), num_q_heads)
    vg = _expand_kv(vg.astype(jnp.float32), num_q_heads)

    scores = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32), kg,
                        precision=jax.lax.Precision.HIGHEST) * scale
    pos = jnp.arange(max_pages * page_size)[None, :]
    valid = pos < context_lens[:, None]
    if window_size is not None and window_size > 0:
        valid = valid & ((context_lens[:, None] - 1 - pos) < window_size)
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = jnp.where(valid[:, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhk,bhkd->bhd", p / jnp.where(l == 0, 1.0, l), vg,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(q.dtype)
