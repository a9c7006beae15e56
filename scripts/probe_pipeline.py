"""A/B the software-pipelined score matmul (AULE_FLASH_PIPELINE)."""
import os
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.reference import attention_reference_numpy
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)
os.environ["AULE_FLASH_PIPELINE"] = "1"

# correctness on chip first
qn = rng.standard_normal((1, 8, 1024, 128)).astype(np.float32)
kn = rng.standard_normal((1, 2, 1024, 128)).astype(np.float32)
vn = rng.standard_normal((1, 2, 1024, 128)).astype(np.float32)
out = flash_attention_fwd(jnp.asarray(qn, jnp.bfloat16),
                          jnp.asarray(kn, jnp.bfloat16),
                          jnp.asarray(vn, jnp.bfloat16),
                          causal=True, block_kv_compute=512,
                          return_lse=False, interpret=False)
want = attention_reference_numpy(qn, kn, vn, causal=True)
err = np.abs(np.asarray(out, np.float32) - want).max()
print(f"pipelined causal correctness max_abs_err={err:.3e}", flush=True)
assert err < 3e-2, err

B, HQ, HKV, S, D = 4, 32, 8, 4096, 128
q = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)

for pipe in ("1", "0"):
    os.environ["AULE_FLASH_PIPELINE"] = pipe
    cases = ([(True, 512), (False, 512)] if pipe == "1"
             else [(True, 512), (False, 512), (True, None)])
    for causal, bkvc in cases:
        def run(q, k, v, causal=causal, bkvc=bkvc):
            return flash_attention_fwd(q, k, v, causal=causal,
                                       block_kv_compute=bkvc,
                                       return_lse=False, interpret=False)
        try:
            t = benchmark(run, q, k, v, iters=10)
        except Exception as e:
            print(f"pipe={pipe} causal={causal} c{bkvc}: FAIL "
                  f"{str(e)[:90]}", flush=True)
            continue
        fl = attention_flops(B, HQ, S, S, D, causal=causal)
        print(f"pipe={pipe} causal={causal} c{bkvc or 1024}: "
              f"{t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s "
              f"({fl/t/1e12/197*100:.1f}%)", flush=True)
