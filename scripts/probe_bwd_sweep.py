"""Backward tile sweep after the GQA-group/tier rewrite."""
import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu import config as cfgmod
from aule_tpu.ops.flash_vjp import flash_attention_vjp
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)
D = 128
q = jnp.asarray(rng.standard_normal((4, 32, 2048, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((4, 8, 2048, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((4, 8, 2048, D)), jnp.bfloat16)

tiles = cfgmod.get_tile_config()
for budget, bkv in [(512, 1024), (1024, 1024), (1024, 2048), (2048, 1024),
                    (512, 2048), (1024, 512)]:
    tiles.block_q_dq = budget
    tiles.block_kv_dkv = bkv

    def fwd_bwd(q, k, v):
        def loss(q, k, v):
            return jnp.sum(flash_attention_vjp(
                q, k, v, causal=True).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    try:
        t = benchmark(fwd_bwd, q, k, v, iters=5)
    except Exception as e:
        print(f"rows{budget} bkv{bkv}: FAIL {str(e)[:80]}", flush=True)
        continue
    fl = attention_flops(4, 32, 2048, 2048, D, causal=True, backward=True) \
        + attention_flops(4, 32, 2048, 2048, D, causal=True)
    print(f"rows{budget} bkv{bkv}: {t*1e3:.2f} ms  {fl/t/1e12:.1f} "
          f"TFLOP/s eff ({fl/t/1e12/197*100:.1f}%)", flush=True)
