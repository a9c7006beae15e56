"""A/B the bf16 probability pipeline (AULE_FLASH_F32_P opt-out)."""
import os
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.reference import attention_reference_numpy
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)

# correctness on chip (bf16 GQA causal)
qn = rng.standard_normal((1, 8, 1024, 128)).astype(np.float32)
kn = rng.standard_normal((1, 2, 1024, 128)).astype(np.float32)
vn = rng.standard_normal((1, 2, 1024, 128)).astype(np.float32)
out = flash_attention_fwd(jnp.asarray(qn, jnp.bfloat16),
                          jnp.asarray(kn, jnp.bfloat16),
                          jnp.asarray(vn, jnp.bfloat16),
                          causal=True, return_lse=False, interpret=False)
want = attention_reference_numpy(qn, kn, vn, causal=True)
err = np.abs(np.asarray(out, np.float32) - want).max()
print(f"bf16-p causal correctness max_abs_err={err:.3e}", flush=True)
assert err < 3e-2, err

B, HQ, HKV, S, D = 4, 32, 8, 4096, 128
q = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)

for f32p in ("0", "1"):
    os.environ["AULE_FLASH_F32_P"] = f32p
    for causal in (True, False):
        def run(q, k, v, causal=causal):
            return flash_attention_fwd(q, k, v, causal=causal,
                                       return_lse=False, interpret=False)
        t = benchmark(run, q, k, v, iters=10)
        fl = attention_flops(B, HQ, S, S, D, causal=causal)
        name = "bf16-p" if f32p == "0" else "f32-p "
        print(f"{name} causal={causal}: {t*1e3:.2f} ms  "
              f"{fl/t/1e12:.1f} TFLOP/s ({fl/t/1e12/197*100:.1f}%)",
              flush=True)
