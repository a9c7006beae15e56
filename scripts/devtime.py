"""On-device timing harness.

Host-side timing through the remote-device transport is unreliable
(block_until_ready can ack early; per-dispatch latency jitter is ~ms), so
all tuning/benchmarks run the op inside a single jitted lax.fori_loop with
a *dynamic* trip count (one compile) and a scalar readback, reporting
  median over reps of (t(n_iters) - t(1)) / (n_iters - 1).

The loop body perturbs the first argument with `carry * 0` — a float
multiply XLA cannot fold (NaN/Inf semantics) — which both defeats
loop-invariant code motion and serializes iterations via the carry chain.
"""

import time

import jax
import jax.numpy as jnp


def devtime(fn, *args, n_iters=100, reps=3):
    """Median per-iteration device time (s) of fn(*args) -> array/pytree."""
    args = list(args)
    first, rest = args[0], args[1:]

    def loop(n, first, *rest):
        def body(i, carry):
            eps = (carry * 0.0).astype(first.dtype)
            x = first + eps.reshape((1,) * first.ndim)
            o = fn(x, *rest)
            leaf = jax.tree_util.tree_leaves(o)[0]
            return carry + leaf.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jloop = jax.jit(loop)
    n1 = jnp.int32(1)
    nN = jnp.int32(n_iters)
    float(jloop(n1, first, *rest))
    float(jloop(nN, first, *rest))
    results = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jloop(n1, first, *rest))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jloop(nN, first, *rest))
        tN = time.perf_counter() - t0
        results.append((tN - t1) / (n_iters - 1))
    results.sort()
    return results[len(results) // 2]
