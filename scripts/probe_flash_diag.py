"""Split causal MFU gap: ragged-skip effect + mask-VPU vs predication."""
import os
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)
B, HQ, HKV, S, D = 4, 32, 8, 4096, 128
q = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)


def bench(name, **kw):
    def run(q, k, v, kw=kw):
        return flash_attention_fwd(q, k, v, return_lse=False,
                                   interpret=False, **kw)
    t = benchmark(run, q, k, v, iters=10)
    fl = attention_flops(B, HQ, S, S, D, causal=kw.get("causal", True))
    print(f"{name}: {t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s "
          f"({fl/t/1e12/197*100:.1f}%)", flush=True)


bench("causal (ragged-skip)", causal=True)
os.environ["AULE_FLASH_DEBUG_FORCE_CLEAN"] = "1"
bench("causal FORCE_CLEAN (perf ceiling of tier structure)", causal=True)
del os.environ["AULE_FLASH_DEBUG_FORCE_CLEAN"]
bench("noncausal", causal=False)
