"""Round-4 causal-MFU schedule sweep (VERDICT r3 item 1).

Sweeps the trace-time schedule knobs the r3 campaign never ran:
AULE_FLASH_DIAG_STRIPS x AULE_FLASH_DIAG_PAIR x AULE_FLASH_PIPELINE,
plus the diag-off baseline, at the two headline causal shapes.  Every
knob binds at trace time and flash_attention_fwd is traced fresh per
call, so one process sweeps them all (each config still pays its own
~30s Mosaic compile).

Run on chip: PYTHONPATH=. python scripts/probe_r4_mfu.py
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops import flash
from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.utils.profiling import attention_flops, benchmark, device_peaks

dev = jax.devices()[0]
PEAK = device_peaks()[0]
print(f"device: {dev.device_kind}  peak {PEAK} TFLOP/s", flush=True)
rng = np.random.default_rng(7)

SHAPES = [(4, 32, 8, 4096), (8, 32, 8, 2048)]
if "--s8k" in sys.argv:
    SHAPES.append((2, 32, 8, 8192))

CONFIGS = [
    # (label, env overrides)
    ("diag-off        ", {"AULE_FLASH_DIAG": "0"}),
    ("strips2         ", {"AULE_FLASH_DIAG_STRIPS": "2"}),
    ("strips4 (deflt) ", {}),
    ("strips8         ", {"AULE_FLASH_DIAG_STRIPS": "8"}),
    ("strips4+pair    ", {"AULE_FLASH_DIAG_PAIR": "1"}),
    ("strips8+pair    ", {"AULE_FLASH_DIAG_STRIPS": "8",
                          "AULE_FLASH_DIAG_PAIR": "1"}),
    ("pipe+group1     ", {"AULE_FLASH_PIPELINE": "1"}),
    ("pipe+diag-off   ", {"AULE_FLASH_PIPELINE": "1",
                          "AULE_FLASH_DIAG": "0"}),
]
KNOBS = ["AULE_FLASH_DIAG", "AULE_FLASH_DIAG_STRIPS",
         "AULE_FLASH_DIAG_PAIR", "AULE_FLASH_PIPELINE"]


def mk(b, hq, hkv, s, d=128, dtype=jnp.bfloat16):
    q = rng.standard_normal((b, hq, s, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    return (jnp.asarray(q, dtype), jnp.asarray(k, dtype),
            jnp.asarray(v, dtype))


for (b, hq, hkv, s) in SHAPES:
    q, k, v = mk(b, hq, hkv, s)
    fl = attention_flops(b, hq, s, s, 128, causal=True)
    print(f"== B{b} H{hq}/{hkv} S{s} D128 bf16 causal ==", flush=True)
    for label, env in CONFIGS:
        for kn in KNOBS:
            os.environ.pop(kn, None)
        os.environ.update(env)

        def run(q, k, v):
            return flash_attention_fwd(q, k, v, causal=True,
                                       return_lse=False, interpret=False)

        try:
            t = benchmark(run, q, k, v, iters=10)
        except Exception as e:
            print(f"  {label}: FAIL {e!r:.160}", flush=True)
            continue
        lay = dict(flash.LAST_LAYOUT)
        print(f"  {label}: {t*1e3:6.2f} ms  {fl/t/1e12:6.1f} TF/s "
              f"({fl/t/1e12/PEAK*100:4.1f}%)  layout={lay}", flush=True)
    for kn in KNOBS:
        os.environ.pop(kn, None)
print("OK", flush=True)
