"""Cross-shard softmax combination primitives.

The distributed analog of the in-kernel online-softmax rescale
(the reference's per-tile m/l correction, attention_f32.comp:197-213,
applied across chips instead of tiles).  This is the communication layer the
reference lacks entirely (SURVEY.md §2.4): partial attention results
(o_i, lse_i) computed against disjoint KV shards are merged with
exp-weighted averaging, exchanging only O(D + 1) values per query instead
of the KV cache itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.flash import DEFAULT_MASK_VALUE


def softmax_combine_pair(o1, lse1, o2, lse2):
    """Merge two partial attention results (same queries, disjoint KV).

    o*: [..., D]; lse*: [...] (log-sum-exp of that shard's scores).
    Returns the exact (o, lse) of the union of the two KV sets.

    Differentiable: the max-shift is stop_gradient'ed — the combine is
    invariant to the shift, so its true derivative contribution is zero
    and blocking it keeps autodiff exact (and avoids pmax's missing
    transpose in the allreduce variant below).
    """
    lse_max = jax.lax.stop_gradient(jnp.maximum(lse1, lse2))
    w1 = jnp.exp(lse1 - lse_max)
    w2 = jnp.exp(lse2 - lse_max)
    denom = w1 + w2
    safe = jnp.where(denom == 0.0, 1.0, denom)
    o = (o1 * w1[..., None] + o2 * w2[..., None]) / safe[..., None]
    lse = jnp.where(denom > 0.0, lse_max + jnp.log(safe), DEFAULT_MASK_VALUE)
    return o, lse


def softmax_combine_allreduce(o_partial, lse_partial, axis_name: str):
    """Merge partial attention across a mesh axis with pmax+psum.

    Each device holds (o_i, lse_i) for its KV shard; returns the exact
    full-attention output on every device.  Cost: one pmax + two psum over
    [..., D]-sized data (vs all-gathering the KV shard itself).
    """
    # stop_gradient on the INPUT: pmax has no differentiation rule, and
    # the shift's true derivative contribution is zero anyway
    lse_max = jax.lax.pmax(jax.lax.stop_gradient(lse_partial), axis_name)
    w = jnp.exp(lse_partial - lse_max)
    denom = jax.lax.psum(w, axis_name)
    safe = jnp.where(denom == 0.0, 1.0, denom)
    o = jax.lax.psum(o_partial * w[..., None], axis_name) / safe[..., None]
    lse = jnp.where(denom > 0.0, lse_max + jnp.log(safe), DEFAULT_MASK_VALUE)
    return o, lse
