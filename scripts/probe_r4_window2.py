"""Window-strip schedule strip-count A/B on chip (part 2)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops import flash
from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.utils.profiling import attention_flops, benchmark, device_peaks

PEAK = device_peaks()[0]
print(f"device: {jax.devices()[0].device_kind}", flush=True)
rng = np.random.default_rng(13)

for (b, hq, hkv, s, w, strips_list) in [
        (4, 32, 8, 4096, 256, ["4", "8", "16", "2"]),
        (8, 32, 8, 2048, 256, ["8", "4"]),
        (4, 32, 8, 4096, 1024, ["auto"]),
]:
    qq = jnp.asarray(rng.standard_normal((b, hq, s, 128)), jnp.bfloat16)
    kk = jnp.asarray(rng.standard_normal((b, hkv, s, 128)), jnp.bfloat16)
    vv = jnp.asarray(rng.standard_normal((b, hkv, s, 128)), jnp.bfloat16)
    fl = attention_flops(b, hq, s, s, 128, causal=True, window=w)

    def run_w(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True, window_size=w,
                                   return_lse=False, interpret=False)

    for st in strips_list:
        if st == "auto":
            os.environ.pop("AULE_FLASH_WIN_STRIPS", None)
        else:
            os.environ["AULE_FLASH_WIN_STRIPS"] = st
        try:
            t = benchmark(run_w, qq, kk, vv, iters=20)
        except Exception as e:
            print(f"B{b} S{s} W{w} strips={st}: FAIL {e!r:.120}",
                  flush=True)
            continue
        lay = dict(flash.LAST_LAYOUT)
        print(f"B{b} S{s} W{w} strips={st}: {t*1e3:.2f} ms "
              f"({fl/t/1e12:.1f} TF/s eff, {fl/t/1e12/PEAK*100:.0f}%) "
              f"layout={lay}", flush=True)
    os.environ.pop("AULE_FLASH_WIN_STRIPS", None)
print("OK", flush=True)
