"""Block-size sweep for the flash fwd kernel on the real TPU.

Finds the best (block_q, block_kv) for the benchmark shapes; results feed
config.TILE_TABLE (the shader-variant analog).
"""
import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd

assert jax.devices()[0].platform == "tpu"


def bench(bq, bkv, B=4, H=32, HKV=8, S=4096, D=128, causal=True, window=-1,
          iters=20):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
    f = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=causal, window_size=window,
        block_q=bq, block_kv=bkv, interpret=False)[0])
    out = f(q, k, v)
    out.block_until_ready()
    t0 = time.perf_counter()
    outs = [f(q, k, v) for _ in range(iters)]
    jax.block_until_ready(outs)
    float(jnp.sum(outs[-1]).astype(jnp.float32))  # completion barrier
    dt = (time.perf_counter() - t0) / iters
    flops = 4 * B * H * S * S * D * (0.5 if causal else 1.0)
    return flops / dt / 1e12, dt * 1e3


results = []
for bq, bkv in itertools.product([128, 256, 512, 1024], [128, 256, 512, 1024]):
    try:
        tf, ms = bench(bq, bkv)
        results.append((tf, bq, bkv, ms))
        print(f"bq={bq:4d} bkv={bkv:4d}: {tf:6.1f} TFLOP/s  {ms:7.2f} ms",
              flush=True)
    except Exception as e:
        print(f"bq={bq:4d} bkv={bkv:4d}: FAIL {type(e).__name__}", flush=True)

results.sort(reverse=True)
print("\nbest:", results[:3])

# window + f32 checks with the best config
tf, ms = bench(*results[0][1:3], window=256)
print(f"window=256 best-config: {tf:.1f} effective TFLOP/s {ms:.2f} ms")
