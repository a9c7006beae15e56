"""Rotary position embeddings (half-split convention).

The reference exposes RoPE two ways: fused inside the attention kernels
(python/aule/triton_flash.py:115-131, half-split) and as a standalone helper
(`precompute_rope_frequencies` / `apply_rope_separate`,
triton_flash.py:644-703).  We standardize on the half-split convention
(q1' = q1*cos - q2*sin on the first D/2 lanes, q2' = q1*sin + q2*cos on the
second) since that is what the Python API implies, per SURVEY.md §7.

On TPU, the half-split layout is also the hardware-friendly one: the rotation
is two full-width vector multiplies plus a lane-aligned D/2 roll, with no
even/odd interleaving that would fight the (8, 128) vector register layout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def precompute_rope_frequencies(
    seq_len: int,
    head_dim: int,
    base: float = 10000.0,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (cos, sin) tables of shape [seq_len, head_dim // 2].

    theta_i = base^(-i / (d/2)) for i in 0..d/2, angle = pos * theta_i.
    Matches the reference's convention (triton_flash.py:644-677).
    """
    half = head_dim // 2
    freqs = 1.0 / (base ** (jnp.arange(half, dtype=jnp.float32) / half))
    positions = jnp.arange(seq_len, dtype=jnp.float32)
    angles = positions[:, None] * freqs[None, :]
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Rotate `x [..., S, D]` by position, half-split convention.

    cos/sin: [S_max, D/2] tables.  `positions` ([..., S] or [S]) selects
    rows of the table; defaults to 0..S-1.
    """
    seq_len = x.shape[-2]
    if positions is None:
        c = cos[:seq_len]
        s = sin[:seq_len]
    else:
        c = cos[positions]
        s = sin[positions]
    # broadcast [S, D/2] against [..., S, D/2]
    while c.ndim < x.ndim:
        c = c[None]
        s = s[None]
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    out1 = x1 * c - x2 * s
    out2 = x1 * s + x2 * c
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
