"""Round-2 chip probe: lane-1-stats flash perf + int8-MXU fused decode."""
import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.paged_fused import paged_attention_fused, to_fused_layout
from aule_tpu.ops.quant import quantize_kv
from aule_tpu.ops.reference import paged_attention_reference
from aule_tpu.utils.profiling import (attention_flops, benchmark,
                                      decode_speed_of_light_toks)

rng = np.random.default_rng(42)
print("device:", jax.devices()[0].device_kind, flush=True)

# --- flash perf after lane-1 stats ---
B, HQ, HKV, S, D = 4, 32, 8, 4096, 128
q = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
for causal in (True, False):
    def run(q, k, v, causal=causal):
        return flash_attention_fwd(q, k, v, causal=causal,
                                   return_lse=False, interpret=False)
    t = benchmark(run, q, k, v, iters=10)
    fl = attention_flops(B, HQ, S, S, D, causal=causal)
    print(f"flash causal={causal}: {t*1e3:.2f} ms  {fl/t/1e12:.1f} TFLOP/s "
          f"({fl/t/1e12/197*100:.1f}%)", flush=True)

# --- fused decode: int8 vs bf16, B8 ctx4096 ---
b, hq, hkv, d, page, ctx = 8, 32, 8, 128, 16, 4096
npg = ctx // page
qd = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
kf = jnp.asarray(rng.standard_normal((hkv, b * npg + 1, page, d)),
                 jnp.float32)
vf = jnp.asarray(rng.standard_normal((hkv, b * npg + 1, page, d)),
                 jnp.float32)
bt = jnp.asarray(1 + np.arange(b * npg, dtype=np.int32).reshape(b, npg))
lens = jnp.full((b,), ctx, jnp.int32)

# correctness first (small): int8 on chip vs f32 reference
ctx_s = np.array([200, 130], np.int32)
bts = jnp.asarray(1 + np.arange(2 * 16, dtype=np.int32).reshape(2, 16))
kq, ks = quantize_kv(kf[:, :33], jnp.int8)
vq, vs = quantize_kv(vf[:, :33], jnp.int8)
kvq, sc = to_fused_layout(kq, vq, ks, vs)
got = paged_attention_fused(
    qd[:2].astype(jnp.float32), kvq, bts, jnp.asarray(ctx_s),
    kv_scales=sc, interpret=False)
want = paged_attention_reference(
    np.asarray(qd[:2], np.float32), np.asarray(kf[:, :33]),
    np.asarray(vf[:, :33]), np.asarray(bts), ctx_s)
err = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max()
print(f"int8 decode max_abs_err={err:.3e}", flush=True)
assert err < 5e-2, err

# perf rows
kq, ks = quantize_kv(kf, jnp.int8)
vq, vs = quantize_kv(vf, jnp.int8)
kvq, sc = to_fused_layout(kq, vq, ks, vs)
kvb = to_fused_layout(kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16))

f_bf = jax.jit(lambda q, kv: paged_attention_fused(
    q, kv, bt, lens, interpret=False))
f_i8 = jax.jit(lambda q, kv, sc: paged_attention_fused(
    q, kv, bt, lens, kv_scales=sc, interpret=False))
t_bf = benchmark(f_bf, qd, kvb, iters=50)
t_i8 = benchmark(f_i8, qd, kvq, sc, iters=50)
sol_bf = decode_speed_of_light_toks(b, hkv, ctx, d, 2)
sol_i8 = decode_speed_of_light_toks(b, hkv, ctx, d, 1.125 + 0.0)
print(f"decode bf16 B{b} ctx{ctx}: {b/t_bf:,.0f} tok/s "
      f"({b/t_bf/sol_bf*100:.1f}% of SoL)", flush=True)
print(f"decode int8 B{b} ctx{ctx}: {b/t_i8:,.0f} tok/s "
      f"({b/t_i8/sol_i8*100:.1f}% of int8 SoL, "
      f"{t_bf/t_i8:.2f}x bf16)", flush=True)
print("OK", flush=True)
