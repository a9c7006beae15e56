"""On-device token samplers for the serving engine.

The reference has no sampling at all (it is an attention library); a
serving engine needs it.  All samplers here are jittable and PRNG-pure
(key in, token out), so they run inside the engine's multi-step decode
`lax.scan` — sampling stays on-device, no host round trip per token.

  greedy()                       argmax (deterministic; engine default)
  temperature(t)                 softmax sample at temperature t
  top_k(k, t=1.0)                restrict to the k highest logits
  top_p(p, t=1.0)                nucleus: smallest prefix with mass >= p

Samplers take (logits [..., V], key) and return int32 tokens shaped like
the leading dims.  The engine threads a fold-per-step key chain so
multi-step decode is reproducible from its seed.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Sampler = Callable[[jnp.ndarray, jax.Array], jnp.ndarray]


def greedy() -> Sampler:
    def sample(logits, key):
        del key
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return sample


def temperature(t: float = 1.0) -> Sampler:
    if t <= 0:
        return greedy()

    def sample(logits, key):
        return jax.random.categorical(
            key, logits.astype(jnp.float32) / t, axis=-1).astype(jnp.int32)

    return sample


def top_k(k: int, t: float = 1.0) -> Sampler:
    if k <= 0:
        raise ValueError("top_k needs k >= 1")

    def sample(logits, key):
        lf = logits.astype(jnp.float32)
        kth = jax.lax.top_k(lf, k)[0][..., -1:]
        masked = jnp.where(lf >= kth, lf, -jnp.inf)
        return jax.random.categorical(
            key, masked / max(t, 1e-6), axis=-1).astype(jnp.int32)

    return sample


def top_p(p: float, t: float = 1.0) -> Sampler:
    if not 0.0 < p <= 1.0:
        raise ValueError("top_p needs 0 < p <= 1")

    def sample(logits, key):
        lf = logits.astype(jnp.float32) / max(t, 1e-6)
        sorted_lf = jnp.sort(lf, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_lf, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with mass >= p (always >= 1 token)
        cutoff_idx = jnp.sum((cum < p).astype(jnp.int32), axis=-1,
                             keepdims=True)
        cutoff = jnp.take_along_axis(sorted_lf, cutoff_idx, axis=-1)
        masked = jnp.where(lf >= cutoff, lf, -jnp.inf)
        return jax.random.categorical(key, masked, axis=-1).astype(
            jnp.int32)

    return sample


def make_engine_sampler(sampler: Sampler,
                        seed: int = 0) -> Callable[[jnp.ndarray],
                                                   jnp.ndarray]:
    """Adapt a (logits, key) sampler to the engine's logits->token
    signature with a fold-per-call key chain.

    The chain is host-side state, so whole-prompt prefill sampling is
    reproducible per call order; for the jittable multi-step decode path
    the engine passes keys explicitly (see ServingEngine(decode_rng=...)).
    """
    state = {"key": jax.random.key(seed)}

    def fn(logits):
        state["key"], sub = jax.random.split(state["key"])
        return sampler(logits, sub)

    fn.sampler = sampler  # the engine unwraps this for in-scan sampling
    return fn
