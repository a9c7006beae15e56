"""r5: chip sweep of the static mono causal schedule vs the diag baseline.

Targets (r4 verdict item 2): B4/S4096 >= 70% MFU (138 TF/s),
B8/S2048 >= 55% (108 TF/s).  197 TF/s bf16 peak on v5e.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd, LAST_LAYOUT
from aule_tpu.utils.profiling import benchmark

SHAPES = [
    (4, 32, 8, 4096),
    (8, 32, 8, 2048),
    (1, 32, 8, 2048),
    (1, 32, 8, 4096),
    (4, 32, 32, 4096),   # MHA
    (1, 32, 8, 1024),
]


def run(b, hq, hkv, s, lse=False):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, hq, s, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, 128)), jnp.bfloat16)
    fn = lambda q, k, v: flash_attention_fwd(q, k, v, causal=True,
                                             return_lse=lse)
    fn(q, k, v)  # trace once so LAST_LAYOUT reflects this config
    layout = dict(LAST_LAYOUT)
    fl_est = 2 * b * hq * s * s * 128
    iters = max(20, min(400, int(3e9 * 197 / fl_est)))  # >=30ms timed loop
    dt = benchmark(fn, q, k, v, iters=iters)
    fl = 2 * b * hq * s * s * 128
    tf = fl / dt / 1e12
    return dt, tf, layout


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for (b, hq, hkv, s) in SHAPES:
        if only and only != f"B{b}S{s}H{hkv}":
            continue
        base_env = {}
        print(f"=== B{b} Hq{hq} Hkv{hkv} S{s} D128 bf16 causal ===")
        # baseline: mono off (diag path)
        os.environ["AULE_FLASH_MONO"] = "0"
        dt, tf, lay = run(b, hq, hkv, s)
        print(f"  diag baseline: {dt*1e3:7.3f} ms {tf:6.1f} TF/s "
              f"({tf/197*100:4.1f}%)  layout={lay}")
        os.environ["AULE_FLASH_MONO"] = "1"
        gqa = hq // hkv
        for hb in [h for h in (4, 2, 1) if gqa % h == 0]:
            for sh in (256, 128):
                os.environ["AULE_FLASH_MONO_HB"] = str(hb)
                os.environ["AULE_FLASH_MONO_SH"] = str(sh)
                try:
                    dt, tf, lay = run(b, hq, hkv, s)
                    used = lay.get("mono_hb")
                    tag = "" if used else "  [FELL THROUGH]"
                    print(f"  mono hb={hb} sh={sh}: {dt*1e3:7.3f} ms "
                          f"{tf:6.1f} TF/s ({tf/197*100:4.1f}%){tag}")
                except Exception as ex:
                    print(f"  mono hb={hb} sh={sh}: FAIL {str(ex)[:120]}")
                finally:
                    os.environ.pop("AULE_FLASH_MONO_HB", None)
                    os.environ.pop("AULE_FLASH_MONO_SH", None)
