"""Round-4 window-strip kernel chip probe: compile + numerics + A/B.

Verdict r3 item 4: window prefill ran at 9.4% effective utilization
(18.5 TFLOP/s at B4/S4096/W256).  Targets: >=2x wall vs full causal at
B4/S4096/W256 (>=40 TFLOP/s effective) and >=1.15x at B8/S2k.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4_window.py
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops import flash
from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.reference import attention_reference_numpy
from aule_tpu.utils.profiling import attention_flops, benchmark, device_peaks

PEAK = device_peaks()[0]
print(f"device: {jax.devices()[0].device_kind}", flush=True)
rng = np.random.default_rng(9)

# --- compiled numerics ---
q = rng.standard_normal((1, 8, 1024, 128)).astype(np.float32)
k = rng.standard_normal((1, 2, 1024, 128)).astype(np.float32)
v = rng.standard_normal((1, 2, 1024, 128)).astype(np.float32)
o = flash_attention_fwd(
    jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
    jnp.asarray(v, jnp.bfloat16), causal=True, window_size=256,
    return_lse=False, interpret=False)
lay = dict(flash.LAST_LAYOUT)
want = attention_reference_numpy(q, k, v, causal=True, window_size=256)
err = np.abs(np.asarray(o, np.float32) - want).max()
print(f"win numerics bf16 W256: err={err:.2e} layout={lay}", flush=True)
assert lay["win_strips"] > 0 and err < 4e-2, (lay, err)

# --- perf: new schedule vs old (AULE_FLASH_WIN=0) vs full causal ---
for (b, hq, hkv, s, w) in [(4, 32, 8, 4096, 256), (8, 32, 8, 2048, 256),
                           (1, 32, 8, 8192, 256), (4, 32, 8, 4096, 1024)]:
    qq = jnp.asarray(rng.standard_normal((b, hq, s, 128)), jnp.bfloat16)
    kk = jnp.asarray(rng.standard_normal((b, hkv, s, 128)), jnp.bfloat16)
    vv = jnp.asarray(rng.standard_normal((b, hkv, s, 128)), jnp.bfloat16)
    fl = attention_flops(b, hq, s, s, 128, causal=True, window=w)
    flc = attention_flops(b, hq, s, s, 128, causal=True)

    def run_w(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True, window_size=w,
                                   return_lse=False, interpret=False)

    def run_c(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True,
                                   return_lse=False, interpret=False)

    os.environ.pop("AULE_FLASH_WIN", None)
    t_new = benchmark(run_w, qq, kk, vv, iters=20)
    lay = dict(flash.LAST_LAYOUT)
    os.environ["AULE_FLASH_WIN"] = "0"
    t_old = benchmark(run_w, qq, kk, vv, iters=20)
    os.environ.pop("AULE_FLASH_WIN", None)
    t_full = benchmark(run_c, qq, kk, vv, iters=10)
    print(f"B{b} S{s} W{w}: new {t_new*1e3:.2f} ms "
          f"({fl/t_new/1e12:.1f} TF/s eff, {fl/t_new/1e12/PEAK*100:.0f}%) "
          f"| old {t_old*1e3:.2f} | full {t_full*1e3:.2f} "
          f"({flc/t_full/1e12:.1f} TF/s) | speedup vs full "
          f"{t_full/t_new:.2f}x | layout={lay}", flush=True)
print("OK", flush=True)
