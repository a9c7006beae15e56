"""Post-round tile check: rows budget 1280 and whole-row DMA tiles."""
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)
for (b, s, kw, name) in [
    (4, 4096, {}, "S4096 default (rows1024 bkv4096 c1024)"),
    (4, 4096, dict(block_q=320), "S4096 rows1280 (bq320)"),
    (2, 8192, {}, "S8192 default"),
    (2, 8192, dict(block_kv=8192), "S8192 bkv8192"),
]:
    q = jnp.asarray(rng.standard_normal((b, 32, s, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, 8, s, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, 8, s, 128)), jnp.bfloat16)
    def run(q, k, v, kw=kw):
        return flash_attention_fwd(q, k, v, causal=True, return_lse=False,
                                   interpret=False, **kw)
    try:
        t = benchmark(run, q, k, v, iters=10)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:80]}", flush=True)
        continue
    fl = attention_flops(b, 32, s, s, 128, causal=True)
    print(f"{name}: {t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s "
          f"({fl/t/1e12/197*100:.1f}%)", flush=True)
