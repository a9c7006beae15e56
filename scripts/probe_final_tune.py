"""Final round-2 tuning: f32 flash tiles post-lane-1-stats; decode ppcb."""
import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.paged_fused import paged_attention_fused, to_fused_layout
from aule_tpu.utils.profiling import (attention_flops, benchmark,
                                      decode_speed_of_light_toks)

rng = np.random.default_rng(42)

# --- f32 flash tiles (defaults currently rows512/bkv2048/c512) ---
B, HQ, HKV, S, D = 2, 32, 8, 2048, 128
q = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.float32)
k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.float32)
for name, kw in [
    ("f32 default (512r/2048/c512)", {}),
    ("f32 512r/2048/c1024", dict(block_q=128, block_kv=2048,
                                 block_kv_compute=1024)),
    ("f32 1024r/2048/c512", dict(block_q=256, block_kv=2048,
                                 block_kv_compute=512)),
]:
    def run(q, k, v, kw=kw):
        return flash_attention_fwd(q, k, v, causal=True, return_lse=False,
                                   interpret=False, **kw)
    try:
        t = benchmark(run, q, k, v, iters=10)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:80]}", flush=True)
        continue
    fl = attention_flops(B, HQ, S, S, D, causal=True)
    print(f"{name}: {t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s", flush=True)

# --- decode ppcb sweep at ctx 8192 bf16 ---
b, hq, hkv, d, page, ctx = 8, 32, 8, 128, 16, 8192
npg = ctx // page
qd = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
kf = jnp.asarray(rng.standard_normal((hkv, b * npg + 1, page, d)),
                 jnp.float32)
vf = jnp.asarray(rng.standard_normal((hkv, b * npg + 1, page, d)),
                 jnp.float32)
bt = jnp.asarray(1 + np.arange(b * npg, dtype=np.int32).reshape(b, npg))
lens = jnp.full((b,), ctx, jnp.int32)
kv = to_fused_layout(kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16))
for ppcb in (32, 64):
    f = jax.jit(lambda q, kv, ppcb=ppcb: paged_attention_fused(
        q, kv, bt, lens, pages_per_compute_block=ppcb, interpret=False))
    t = benchmark(f, qd, kv, iters=100)
    sol = decode_speed_of_light_toks(b, hkv, ctx, d, 2)
    print(f"decode bf16 ctx{ctx} ppcb{ppcb}: {b/t:,.0f} tok/s "
          f"({b/t/sol*100:.1f}% SoL)", flush=True)
