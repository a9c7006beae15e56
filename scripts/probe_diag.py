"""Round-3 chip probe: diagonal-strip causal schedule (VERDICT r2 #1).

Measures the causal prefill grid with the block-aligned diagonal-strip
decomposition on/off and across strip counts, plus correctness on chip.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops import flash
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


# --- correctness on chip: diag path, bf16 GQA + f32 MHA ---
q, k, v, qn, kn, vn = mk(1, 32, 8, 2048, 128)
out = flash_attention_fwd(q, k, v, causal=True, return_lse=False,
                          interpret=False)
assert flash.LAST_LAYOUT["diag_strips"] > 0, flash.LAST_LAYOUT
want = attention_reference_numpy(qn, kn, vn, causal=True)
err = float(np.max(np.abs(np.asarray(out, np.float32) - want)))
print(f"diag gqa32:8 S2048 bf16 err={err:.2e} {flash.LAST_LAYOUT}",
      flush=True)
assert err < 3e-2, err

q, k, v, qn, kn, vn = mk(1, 4, 4, 1024, 128, jnp.float32)
out, lse = flash_attention_fwd(q, k, v, causal=True, interpret=False)
want, wlse = attention_reference_numpy(qn, kn, vn, causal=True,
                                       return_lse=True)
err = float(np.max(np.abs(np.asarray(out) - want)))
lerr = float(np.max(np.abs(np.asarray(lse) - wlse)))
print(f"diag mha S1024 f32 err={err:.2e} lse={lerr:.2e} "
      f"{flash.LAST_LAYOUT}", flush=True)
assert err < 1e-4 and lerr < 1e-4, (err, lerr)

# --- perf grid ---
shapes = [(4, 32, 8, 4096), (8, 32, 8, 2048), (1, 32, 8, 4096),
          (1, 32, 8, 8192), (1, 32, 8, 16384)]
variants = [("off", {"AULE_FLASH_DIAG": "0"}),
            ("s2", {"AULE_FLASH_DIAG_STRIPS": "2"}),
            ("s4", {"AULE_FLASH_DIAG_STRIPS": "4"}),
            ("s8", {"AULE_FLASH_DIAG_STRIPS": "8"}),
            ("s4pair", {"AULE_FLASH_DIAG_STRIPS": "4",
                        "AULE_FLASH_DIAG_PAIR": "1"})]
only = sys.argv[1:] or None
for (b, hq, hkv, s) in shapes:
    if only and str(s) not in only:
        continue
    q, k, v, *_ = mk(b, hq, hkv, s, 128)
    for name, env in variants:
        for kk in ("AULE_FLASH_DIAG", "AULE_FLASH_DIAG_STRIPS",
                   "AULE_FLASH_DIAG_PAIR"):
            os.environ.pop(kk, None)
        os.environ.update(env)

        def run(q, k, v):
            return flash_attention_fwd(q, k, v, causal=True,
                                       return_lse=False, interpret=False)

        t = benchmark(run, q, k, v, iters=10)
        fl = attention_flops(b, hq, s, s, 128, causal=True)
        print(f"B{b} H{hq}/{hkv} S{s} {name}: {t*1e3:.3f} ms  "
              f"{fl/t/1e12:.1f} TFLOP/s  ({fl/t/1e12/197*100:.1f}%)",
              flush=True)
for kk in ("AULE_FLASH_DIAG", "AULE_FLASH_DIAG_STRIPS",
           "AULE_FLASH_DIAG_PAIR"):
    os.environ.pop(kk, None)
print("OK", flush=True)
