"""Single-chip long-context prefill: flash causal at S=16k/32k."""
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)
for s, b, hq, hkv in [(16384, 1, 32, 8), (32768, 1, 8, 2)]:
    q = jnp.asarray(rng.standard_normal((b, hq, s, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, 128)), jnp.bfloat16)

    def run(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True, return_lse=False,
                                   interpret=False)
    t = benchmark(run, q, k, v, iters=5)
    fl = attention_flops(b, hq, s, s, 128, causal=True)
    print(f"B{b} H{hq}/{hkv} S{s}: {t*1e3:.1f} ms  {fl/t/1e12:.1f} "
          f"TFLOP/s ({fl/t/1e12/197*100:.1f}%)", flush=True)
