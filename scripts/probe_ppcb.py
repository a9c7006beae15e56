"""ppcb 32 vs 64 across ctx and dtypes before flipping the default."""
import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.paged_fused import paged_attention_fused, to_fused_layout
from aule_tpu.ops.quant import quantize_kv
from aule_tpu.utils.profiling import benchmark, decode_speed_of_light_toks

rng = np.random.default_rng(42)
b, hq, hkv, d, page = 8, 32, 8, 128, 16
for ctx in (2048, 4096):
    npg = ctx // page
    qd = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    kf = jnp.asarray(rng.standard_normal((hkv, b * npg + 1, page, d)),
                     jnp.float32)
    vf = jnp.asarray(rng.standard_normal((hkv, b * npg + 1, page, d)),
                     jnp.float32)
    bt = jnp.asarray(1 + np.arange(b * npg, dtype=np.int32).reshape(b, npg))
    lens = jnp.full((b,), ctx, jnp.int32)
    kv = to_fused_layout(kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16))
    kq, ks = quantize_kv(kf, jnp.int8)
    vq, vs = quantize_kv(vf, jnp.int8)
    kvq, sc = to_fused_layout(kq, vq, ks, vs)
    for ppcb in (32, 64):
        f = jax.jit(lambda q, kv, ppcb=ppcb: paged_attention_fused(
            q, kv, bt, lens, pages_per_compute_block=ppcb,
            interpret=False))
        t = benchmark(f, qd, kv, iters=100)
        sol = decode_speed_of_light_toks(b, hkv, ctx, d, 2)
        print(f"bf16 ctx{ctx} ppcb{ppcb}: {b/t:,.0f} tok/s "
              f"({b/t/sol*100:.1f}%)", flush=True)
        fq = jax.jit(lambda q, kv, sc, ppcb=ppcb: paged_attention_fused(
            q, kv, bt, lens, kv_scales=sc, pages_per_compute_block=ppcb,
            interpret=False))
        tq = benchmark(fq, qd, kvq, sc, iters=100)
        solq = decode_speed_of_light_toks(b, hkv, ctx, d, 1.125)
        print(f"int8 ctx{ctx} ppcb{ppcb}: {b/tq:,.0f} tok/s "
              f"({b/tq/solq*100:.1f}%)", flush=True)
