"""Sliding-window prefill speedup vs full attention (reference gains
+6%/+8.9%/+11% at 2K/4K/8K, python/README.md:38-40)."""
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.utils.profiling import benchmark

rng = np.random.default_rng(42)
W = 256
for S, B in [(2048, 8), (4096, 4), (8192, 2)]:
    q = jnp.asarray(rng.standard_normal((B, 32, S, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, 8, S, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, 8, S, 128)), jnp.bfloat16)

    def full(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True, return_lse=False,
                                   interpret=False)

    def win(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True, window_size=W,
                                   return_lse=False, interpret=False)

    tf = benchmark(full, q, k, v, iters=10)
    tw = benchmark(win, q, k, v, iters=10)
    print(f"S={S} B={B}: full {tf*1e3:.2f} ms, window(W={W}) "
          f"{tw*1e3:.2f} ms -> {tf/tw:.2f}x", flush=True)
