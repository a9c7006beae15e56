"""Round-4 MFU sweep, part 2: confirm the part-1 winners (strips2 at
S4096, strips4+pair at S2048), fill the untried cells (strips2+pair,
strips1), extend to S8192, and tune the D=256 causal row (generic
bq256/c512 hit 68.4% in the r3 shape sweep; diag was never measured).

Run on chip: PYTHONPATH=.:$PYTHONPATH python scripts/probe_r4_mfu2.py
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops import flash
from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.utils.profiling import attention_flops, benchmark, device_peaks

dev = jax.devices()[0]
PEAK = device_peaks()[0]
print(f"device: {dev.device_kind}  peak {PEAK} TFLOP/s", flush=True)
rng = np.random.default_rng(11)

KNOBS = ["AULE_FLASH_DIAG", "AULE_FLASH_DIAG_STRIPS",
         "AULE_FLASH_DIAG_PAIR", "AULE_FLASH_PIPELINE"]


def mk(b, hq, hkv, s, d=128, dtype=jnp.bfloat16):
    q = rng.standard_normal((b, hq, s, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    return (jnp.asarray(q, dtype), jnp.asarray(k, dtype),
            jnp.asarray(v, dtype))


def sweep(shape, configs, d=128, blocks=None):
    b, hq, hkv, s = shape
    q, k, v = mk(b, hq, hkv, s, d)
    fl = attention_flops(b, hq, s, s, d, causal=True)
    print(f"== B{b} H{hq}/{hkv} S{s} D{d} bf16 causal ==", flush=True)
    for label, env in configs:
        for kn in KNOBS:
            os.environ.pop(kn, None)
        os.environ.update(env)
        bk = blocks or {}

        def run(q, k, v):
            return flash_attention_fwd(q, k, v, causal=True,
                                       return_lse=False, interpret=False,
                                       **bk)

        try:
            t = benchmark(run, q, k, v, iters=10, reps=5)
        except Exception as e:
            print(f"  {label}: FAIL {e!r:.160}", flush=True)
            continue
        lay = dict(flash.LAST_LAYOUT)
        print(f"  {label}: {t*1e3:6.2f} ms  {fl/t/1e12:6.1f} TF/s "
              f"({fl/t/1e12/PEAK*100:4.1f}%)  layout={lay}", flush=True)
    for kn in KNOBS:
        os.environ.pop(kn, None)


S4K = [
    ("strips2        ", {"AULE_FLASH_DIAG_STRIPS": "2"}),
    ("strips2+pair   ", {"AULE_FLASH_DIAG_STRIPS": "2",
                         "AULE_FLASH_DIAG_PAIR": "1"}),
    ("strips1        ", {"AULE_FLASH_DIAG_STRIPS": "1"}),
    ("strips4+pair   ", {"AULE_FLASH_DIAG_PAIR": "1"}),
]
sweep((4, 32, 8, 4096), S4K)
sweep((8, 32, 8, 2048), S4K)
sweep((2, 32, 8, 8192), [
    ("strips2        ", {"AULE_FLASH_DIAG_STRIPS": "2"}),
    ("strips4 (deflt)", {}),
    ("strips2+pair   ", {"AULE_FLASH_DIAG_STRIPS": "2",
                         "AULE_FLASH_DIAG_PAIR": "1"}),
])

# D=256 causal: diag schedule (wide-heads rule halves block_q to 512 ->
# diag bq=bkvc=512) vs the r3 generic sweep winner (bq256/bkv2048/c512).
D256 = (2, 16, 4, 4096)
sweep(D256, [
    ("diag strips2   ", {"AULE_FLASH_DIAG_STRIPS": "2"}),
    ("diag strips4   ", {}),
    ("diag-off(table) ", {"AULE_FLASH_DIAG": "0"}),
], d=256)
sweep(D256, [
    ("generic bq256/c512", {"AULE_FLASH_DIAG": "0"}),
], d=256, blocks=dict(block_q=256, block_kv=2048, block_kv_compute=512))
print("OK", flush=True)
