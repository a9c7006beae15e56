"""Chip probe: single-body-per-chunk causal walk vs the interior/edge
tier walk.

Hypothesis (r2 finding: Mosaic cost scales with conditional-region COUNT,
not branch-taken frequency): halving bodies per chunk (tier walk = 2,
single = 1, always masked) recovers part of the ~20% causal-vs-noncausal
rate gap that is not diagonal-chunk waste; mask VPU cost is only ~3.5%.
"""
import os
import sys

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


# correctness first (single-body, small shape)
os.environ["AULE_FLASH_BODY"] = "single"
q, k, v, qn, kn, vn = mk(1, 8, 2, 1024, 128)
out = flash_attention_fwd(q, k, v, causal=True, return_lse=False,
                          interpret=False)
want = attention_reference_numpy(qn, kn, vn, causal=True)
err = float(np.max(np.abs(np.asarray(out, np.float32) - want)))
print(f"single-body causal S1024 max_abs_err={err:.2e}", flush=True)
assert err < 3e-2, err

for mode in ("tier", "single"):
    os.environ["AULE_FLASH_BODY"] = mode
    for (b, hq, hkv, s) in [(4, 32, 8, 4096), (8, 32, 8, 2048)]:
        q, k, v, *_ = mk(b, hq, hkv, s, 128)

        def run(q, k, v):
            return flash_attention_fwd(
                q, k, v, causal=True, return_lse=False, interpret=False)

        t = benchmark(run, q, k, v, iters=10, reps=3)
        fl = attention_flops(b, hq, s, s, 128, causal=True)
        print(f"{mode:6s} B{b} H{hq}/{hkv} S{s}: {t*1e3:.2f} ms  "
              f"{fl/t/1e12:.1f} TFLOP/s  ({fl/t/1e12/197*100:.1f}%)",
              flush=True)
print("OK", flush=True)
