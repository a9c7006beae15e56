"""Causal-v3 (group-batched strips, _causal_kernel) chip A/B vs the
r3 diagonal-strip schedule, at the MFU-gap shapes (S <= 4096)."""
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
rng = np.random.default_rng(17)

# compiled numerics first
q = rng.standard_normal((1, 32, 1024, 128)).astype(np.float32)
k = rng.standard_normal((1, 8, 1024, 128)).astype(np.float32)
v = rng.standard_normal((1, 8, 1024, 128)).astype(np.float32)
o = flash_attention_fwd(
    jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
    jnp.asarray(v, jnp.bfloat16), causal=True, return_lse=False,
    interpret=False)
lay = dict(flash.LAST_LAYOUT)
err = np.abs(np.asarray(o, np.float32)
             - attention_reference_numpy(q, k, v, causal=True)).max()
print(f"v3 numerics: err={err:.2e} layout={lay}", flush=True)
assert lay.get("c3_strips", 0) > 0 and err < 4e-2, (lay, err)

for (b, hq, hkv, s) in [(4, 32, 8, 4096), (8, 32, 8, 2048),
                        (8, 12, 12, 1024), (2, 16, 4, 2048)]:
    d = 128
    qq = jnp.asarray(rng.standard_normal((b, hq, s, d)), jnp.bfloat16)
    kk = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    vv = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
    fl = attention_flops(b, hq, s, s, d, causal=True)

    def run(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True,
                                   return_lse=False, interpret=False)

    os.environ.pop("AULE_FLASH_CAUSAL_V3", None)
    t3 = benchmark(run, qq, kk, vv, iters=10)
    lay = dict(flash.LAST_LAYOUT)
    os.environ["AULE_FLASH_CAUSAL_V3"] = "0"
    t2 = benchmark(run, qq, kk, vv, iters=10)
    os.environ.pop("AULE_FLASH_CAUSAL_V3", None)
    print(f"B{b} H{hq}/{hkv} S{s}: v3 {t3*1e3:.2f} ms "
          f"({fl/t3/1e12:.1f} TF/s, {fl/t3/1e12/PEAK*100:.0f}%) | "
          f"diag-v2 {t2*1e3:.2f} ms ({fl/t2/1e12:.1f}) | "
          f"v3/v2 {t2/t3:.2f}x | {lay}", flush=True)
print("OK", flush=True)
