"""r3 chip probe: short-context decode (cross-batch DMA baton A/B) +
split-layout head-ganged decode throughput.

VERDICT r2 weak #3 (int8 62.5%/74.4% of SoL at ctx 1k/2k) and missing #3
(split layout 5,954 tok/s, target >=18k at B8/ctx4k).  Run once with
AULE_DECODE_XBATCH=1 (default) and once =0 for the A/B.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.paged import paged_attention
from aule_tpu.ops.paged_fused import paged_attention_fused, to_fused_layout
from aule_tpu.ops.quant import quantize_kv
from aule_tpu.utils.profiling import benchmark, decode_speed_of_light_toks

rng = np.random.default_rng(42)
print("device:", jax.devices()[0].device_kind,
      "XBATCH:", os.environ.get("AULE_DECODE_XBATCH", "1"), flush=True)

B, HQ, HKV, D, PAGE = 8, 32, 8, 128, 16

for ctx in (1024, 2048, 4096, 8192):
    npg = ctx // PAGE
    num_pages = B * npg + 1
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
    kf = jnp.asarray(rng.standard_normal((HKV, num_pages, PAGE, D)),
                     jnp.float32)
    vf = jnp.asarray(rng.standard_normal((HKV, num_pages, PAGE, D)),
                     jnp.float32)
    bt = jnp.asarray(1 + np.arange(B * npg, dtype=np.int32).reshape(B, npg))
    lens = jnp.full((B,), ctx, jnp.int32)

    kv_bf = to_fused_layout(kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16))
    kq, ks = quantize_kv(kf, jnp.int8)
    vq, vs = quantize_kv(vf, jnp.int8)
    kv_i8, sc = to_fused_layout(kq, vq, ks, vs)

    def f_bf(q, kv):
        return paged_attention_fused(q, kv, bt, lens, interpret=False)

    def f_i8(q, kv, sc):
        return paged_attention_fused(q, kv, bt, lens, kv_scales=sc,
                                     interpret=False)

    t_bf = benchmark(f_bf, q, kv_bf, iters=50)
    t_i8 = benchmark(f_i8, q, kv_i8, sc, iters=50)
    sol_bf = decode_speed_of_light_toks(B, HKV, ctx, D, 2)
    sol_i8 = decode_speed_of_light_toks(B, HKV, ctx, D, 1.125)
    print(f"fused bf16 ctx{ctx}: {B/t_bf:,.0f} tok/s "
          f"({B/t_bf/sol_bf*100:.1f}% SoL)", flush=True)
    print(f"fused int8 ctx{ctx}: {B/t_i8:,.0f} tok/s "
          f"({B/t_i8/sol_i8*100:.1f}% SoL)", flush=True)

    # split (vLLM-compat) layout, head-ganged DMA kernel
    kc, vc = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)

    def f_split(q, kc, vc):
        return paged_attention(q, kc, vc, bt, lens, interpret=False)

    t_sp = benchmark(f_split, q, kc, vc, iters=20)
    print(f"split bf16 ctx{ctx}: {B/t_sp:,.0f} tok/s "
          f"({B/t_sp/sol_bf*100:.1f}% SoL)", flush=True)
