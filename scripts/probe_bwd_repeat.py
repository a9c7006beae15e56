"""Repeatability check on the fwd+bwd rows (grid vs sweep discrepancy)."""
import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash_vjp import flash_attention_vjp
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)
D = 128
for (b, s) in [(4, 2048), (1, 2048), (2, 4096)]:
    q = jnp.asarray(rng.standard_normal((b, 32, s, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, 8, s, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, 8, s, D)), jnp.bfloat16)

    def fwd_bwd(q, k, v):
        def loss(q, k, v):
            return jnp.sum(flash_attention_vjp(
                q, k, v, causal=True).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    for rep in range(3):
        t = benchmark(fwd_bwd, q, k, v, iters=10)
        fl = attention_flops(b, 32, s, s, D, causal=True, backward=True) \
            + attention_flops(b, 32, s, s, D, causal=True)
        print(f"B{b} S{s} rep{rep}: {t*1e3:.2f} ms  {fl/t/1e12:.1f} "
              f"TFLOP/s eff ({fl/t/1e12/197*100:.1f}%)", flush=True)
