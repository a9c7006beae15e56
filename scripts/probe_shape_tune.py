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

# block_q below is PER-HEAD (flash_attention_fwd passes explicit block_q
# through raw); total rows per grid step = block_q * group.
#
# Diagonal-alignment theory (r3): causal waste ~= bkvc/S when chunk
# boundaries misalign with the q-block causal frontier, but only
# bkvc/(2S) (the irreducible triangle) when block_q_perhead == bkvc, so
# every diagonal chunk ends exactly at the block's frontier.  The open
# chip question is whether the c512 rate collapse (83 TF/s at rows=1024)
# recovers at rows=2048 (bq512 x group4).
if which in ("all", "diag"):
    # headline shape first: B4/S4096 GQA 32/8 (was 52% = 103 TF/s)
    sweep_prefill("B4/S4096 H32/8 D128", 4, 32, 8, 4096, 128, [
        (256, 4096, 1024),   # r2 default (misaligned, 25% waste)
        (512, 2048, 512),    # diag-aligned, 8 regions/step
        (512, 4096, 512),    # diag-aligned, 16 regions (body-count test)
        (512, 4096, 1024),   # rows=2048 at c1024 (R-vs-rows control)
        (1024, 4096, 1024),  # P=1024 aligned c1024: rows=4096 (VMEM?)
    ])
if which in ("all", "prefill"):
    combos = [(256, 2048, 1024),  # current short-seq rule
              (256, 4096, 1024),  # r2 default
              (512, 2048, 512),   # diag-aligned
              (512, 1024, 512),
              (256, 1024, 512),
              (256, 2048, 512)]
    sweep_prefill("B8/S2048 H32/8 D128", 8, 32, 8, 2048, 128, combos)
    # MHA group=1: per-head block IS the total budget
    sweep_prefill("B8/S1024 H12/12 D64 (gpt2)", 8, 12, 12, 1024, 64,
                  [(1024, 1024, 1024), (512, 1024, 512), (512, 512, 512),
                   (1024, 1024, 512), (2048, 1024, 512), (2048, 2048, 512)])
if which in ("all", "d256"):
    sweep_prefill("B2/S4096 H16/4 D256", 2, 16, 4, 4096, 256,
                  [(128, 2048, 1024), (256, 2048, 512), (256, 1024, 512),
                   (128, 1024, 1024), (512, 2048, 512)])
def sweep_split_decode(tag, ctx, ppcbs, b=8, hq=32, hkv=8, d=128, page=16):
    """r3 head-ganged split-layout kernel (VERDICT r2 missing #3: the r2
    per-(head,page)-DMA kernel measured 5,954 tok/s at B8/ctx4k vs 41,698
    fused; target >=18k)."""
    from aule_tpu.ops.paged import paged_attention

    n_pages_seq = ctx // page
    num_pages = b * n_pages_seq + 1
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((hkv, num_pages, page, d)),
                     jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((hkv, num_pages, page, d)),
                     jnp.bfloat16)
    bt = jnp.asarray(1 + np.arange(b * n_pages_seq, dtype=np.int32)
                     .reshape(b, n_pages_seq))
    lens = jnp.full((b,), ctx, jnp.int32)
    # correctness once per shape vs the fused path
    from aule_tpu.ops.paged_fused import paged_attention_fused
    want = paged_attention_fused(q, to_fused_layout(kp, vp), bt, lens,
                                 interpret=False)
    got = paged_attention(q, kp, vp, bt, lens, interpret=False)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(f"{tag} split-vs-fused max_abs={err:.2e}", flush=True)
    for ppcb in ppcbs:
        try:
            def run(q, kp, vp, bt, lens):
                return paged_attention(
                    q, kp, vp, bt, lens,
                    pages_per_compute_block=ppcb, interpret=False)

            t = benchmark(run, q, kp, vp, bt, lens, iters=50, reps=3)
            print(f"{tag} ppcb{ppcb}: {t*1e3:.3f} ms {b/t:,.0f} tok/s",
                  flush=True)
        except Exception as e:
            print(f"{tag} ppcb{ppcb}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if which in ("all", "decode"):
    for ctx in (1024, 2048):
        sweep_decode(f"int8 ctx{ctx}", ctx, True, (8, 16, 32, 64))
        sweep_decode(f"bf16 ctx{ctx}", ctx, False, (8, 16, 32, 64))
if which in ("all", "split"):
    for ctx in (1024, 4096):
        sweep_split_decode(f"split bf16 ctx{ctx}", ctx, (4, 8, 16))
print("OK", flush=True)
