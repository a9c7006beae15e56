"""Round-2 chip probe: GQA-group flash kernel correctness + headline MFU."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.reference import attention_reference_numpy
from aule_tpu.utils.profiling import attention_flops, benchmark

dev = jax.devices()[0]
print(f"device: {dev.device_kind}", flush=True)
rng = np.random.default_rng(42)


def mk(b, hq, hkv, s, d, dtype=jnp.bfloat16):
    q = rng.standard_normal((b, hq, s, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    return (jnp.asarray(q, dtype), jnp.asarray(k, dtype),
            jnp.asarray(v, dtype), q, k, v)


# --- correctness: GQA 32:8 bf16, group-batched rows, on chip ---
q, k, v, qn, kn, vn = mk(1, 32, 8, 1024, 128)
out = flash_attention_fwd(q, k, v, causal=True, return_lse=False,
                          interpret=False)
want = attention_reference_numpy(qn, kn, vn, causal=True)
err = float(np.max(np.abs(np.asarray(out, np.float32) - want)))
print(f"gqa32:8 S1024 bf16 causal max_abs_err={err:.2e}", flush=True)
assert err < 3e-2, err

# --- correctness: f32 odd seq_k (old crash shape) ---
q, k, v, qn, kn, vn = mk(1, 4, 2, 768, 64, jnp.float32)
out = flash_attention_fwd(q, k, v, causal=False, return_lse=False,
                          interpret=False)
want = attention_reference_numpy(qn, kn, vn)
err = float(np.max(np.abs(np.asarray(out) - want)))
print(f"f32 S768 odd-seq max_abs_err={err:.2e}", flush=True)
assert err < 1e-4, err

# --- perf: headline rows ---
for (b, hq, hkv, s) in [(4, 32, 8, 4096), (8, 32, 8, 2048),
                        (2, 32, 8, 8192), (4, 32, 32, 4096)]:
    q, k, v, *_ = mk(b, hq, hkv, s, 128)

    def run(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True, return_lse=False,
                                   interpret=False)

    t = benchmark(run, q, k, v, iters=10)
    fl = attention_flops(b, hq, s, s, 128, causal=True)
    print(f"B{b} H{hq}/{hkv} S{s} bf16 causal: {t*1e3:.2f} ms  "
          f"{fl/t/1e12:.1f} TFLOP/s  ({fl/t/1e12/197*100:.1f}% of v5e peak)",
          flush=True)
print("OK", flush=True)
