"""r3 shape-keyed tile sweep (VERDICT r2 missing #1 / weak #2/#3).

Sweeps the shapes the r2 grid showed underperforming with one tuned row:
  * B8/S2048 prefill (was 38.7%): block_kv/bkvc candidates
  * D=64 MHA GPT-2 shape
  * D=256 GQA shape (new in r3)
  * short-context int8/bf16 fused decode: ppcb candidates at ctx 1k/2k

Writes medians to stdout; winners go into config.py TILE_TABLE rules.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.paged_fused import paged_attention_fused, to_fused_layout
from aule_tpu.ops.quant import quantize_kv
from aule_tpu.utils.profiling import attention_flops, benchmark

print(f"device: {jax.devices()[0].device_kind}", flush=True)
rng = np.random.default_rng(42)


def mk(b, hq, hkv, s, d, dtype=jnp.bfloat16):
    q = rng.standard_normal((b, hq, s, d), dtype=np.float32)
    k = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    v = rng.standard_normal((b, hkv, s, d), dtype=np.float32)
    return (jnp.asarray(q, dtype), jnp.asarray(k, dtype),
            jnp.asarray(v, dtype))


def sweep_prefill(tag, b, hq, hkv, s, d, combos):
    q, k, v = mk(b, hq, hkv, s, d)
    fl = attention_flops(b, hq, s, s, d, causal=True)
    for (bq, bkv, bkvc) in combos:
        try:
            def run(q, k, v):
                return flash_attention_fwd(
                    q, k, v, causal=True, return_lse=False,
                    block_q=bq, block_kv=bkv, block_kv_compute=bkvc,
                    interpret=False)

            t = benchmark(run, q, k, v, iters=10, reps=3)
            print(f"{tag} bq{bq}/bkv{bkv}/c{bkvc}: {t*1e3:.2f} ms "
                  f"{fl/t/1e12:.1f} TF/s ({fl/t/1e12/197*100:.1f}%)",
                  flush=True)
        except Exception as e:
            print(f"{tag} bq{bq}/bkv{bkv}/c{bkvc}: FAIL "
                  f"{type(e).__name__} {str(e)[:120]}", flush=True)


def sweep_decode(tag, ctx, quantized, ppcbs, b=8, hq=32, hkv=8, d=128,
                 page=16):
    n_pages_seq = ctx // page
    num_pages = b * n_pages_seq + 1
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    kf = jnp.asarray(rng.standard_normal((hkv, num_pages, page, d)),
                     jnp.float32)
    vf = jnp.asarray(rng.standard_normal((hkv, num_pages, page, d)),
                     jnp.float32)
    bt = jnp.asarray(1 + np.arange(b * n_pages_seq, dtype=np.int32)
                     .reshape(b, n_pages_seq))
    lens = jnp.full((b,), ctx, jnp.int32)
    if quantized:
        from aule_tpu.ops.paged_fused import pack_fused_scales
        kq, ks = quantize_kv(kf, jnp.int8)
        vq, vs = quantize_kv(vf, jnp.int8)
        kv = to_fused_layout(kq, vq)
        sc = pack_fused_scales(ks, vs)
    else:
        kv = to_fused_layout(
            kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16))
        sc = None
    for ppcb in ppcbs:
        try:
            def run(q, kv, bt, lens):
                return paged_attention_fused(
                    q, kv, bt, lens, kv_scales=sc,
                    pages_per_compute_block=ppcb, interpret=False)

            t = benchmark(run, q, kv, bt, lens, iters=50, reps=3)
            print(f"{tag} ppcb{ppcb}: {t*1e3:.3f} ms "
                  f"{b/t:,.0f} tok/s", flush=True)
        except Exception as e:
            print(f"{tag} ppcb{ppcb}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "prefill"):
    combos = [(1024, 4096, 1024), (1024, 2048, 1024), (1024, 2048, 512),
              (512, 2048, 1024), (1024, 1024, 1024), (512, 1024, 512)]
    sweep_prefill("B8/S2048 H32/8 D128", 8, 32, 8, 2048, 128, combos)
    sweep_prefill("B8/S1024 H12/12 D64 (gpt2)", 8, 12, 12, 1024, 64,
                  combos)
if which in ("all", "d256"):
    sweep_prefill("B2/S4096 H16/4 D256", 2, 16, 4, 4096, 256,
                  [(512, 2048, 1024), (512, 2048, 512), (1024, 2048, 512),
                   (512, 1024, 1024), (256, 2048, 1024)])
if which in ("all", "decode"):
    for ctx in (1024, 2048):
        sweep_decode(f"int8 ctx{ctx}", ctx, True, (8, 16, 32, 64))
        sweep_decode(f"bf16 ctx{ctx}", ctx, False, (8, 16, 32, 64))
print("OK", flush=True)
