"""Is the c512 rate cliff body-count (n_sub) driven or width driven?"""
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)
B, HQ, HKV, S, D = 4, 32, 8, 4096, 128
q = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)

cases = [
    ("nc bkv4096 c512 (n_sub=8)", False, 4096, 512),
    ("nc bkv2048 c512 (n_sub=4)", False, 2048, 512),
    ("nc bkv1024 c512 (n_sub=2)", False, 1024, 512),
    ("nc bkv512  c512 (n_sub=1)", False, 512, 512),
    ("ca bkv1024 c512 (n_sub=2)", True, 1024, 512),
    ("ca bkv512  c512 (n_sub=1)", True, 512, 512),
    ("ca bkv512  c256 bq? n/a", None, None, None),
]
for name, causal, bkv, c in cases:
    if causal is None:
        continue
    def run(q, k, v, causal=causal, bkv=bkv, c=c):
        return flash_attention_fwd(q, k, v, causal=causal, block_kv=bkv,
                                   block_kv_compute=c, return_lse=False,
                                   interpret=False)
    t = benchmark(run, q, k, v, iters=10)
    fl = attention_flops(B, HQ, S, S, D, causal=causal)
    print(f"{name}: {t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s "
          f"({fl/t/1e12/197*100:.1f}%)", flush=True)
