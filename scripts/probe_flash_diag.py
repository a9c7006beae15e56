"""Diagnose where the flash fwd kernel loses MFU: interior-only ceiling
(non-causal), chunk-size sensitivity, DMA-tile sensitivity."""
import jax.numpy as jnp
import numpy as np
import jax

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)
B, HQ, HKV, S, D = 4, 32, 8, 4096, 128
q = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)

cases = [
    ("causal default", dict(causal=True)),
    ("NONcausal default", dict(causal=False)),
    ("causal bq1024-rows bkv2048 c512", dict(causal=True, block_q=256,
                                             block_kv=2048,
                                             block_kv_compute=512)),
    ("causal bkv4096 c2048", dict(causal=True, block_kv=4096,
                                  block_kv_compute=2048)),
    ("causal bkv1024 c1024 (grid-chunk)", dict(causal=True, block_kv=1024,
                                               block_kv_compute=1024)),
    ("causal bq512-rows (bq128)", dict(causal=True, block_q=128)),
    ("causal bq2048-rows (bq512)", dict(causal=True, block_q=512)),
]
for name, kw in cases:
    def run(q, k, v, kw=kw):
        return flash_attention_fwd(q, k, v, return_lse=False,
                                   interpret=False, **kw)
    t = benchmark(run, q, k, v, iters=10)
    fl = attention_flops(B, HQ, S, S, D, causal=kw.get("causal", True))
    print(f"{name}: {t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s "
          f"({fl/t/1e12/197*100:.1f}%)", flush=True)
