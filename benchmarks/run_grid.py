"""Full benchmark grid, mirroring the reference's MI300X suite.

Reproduces the grid of tests/benchmark_mi300x.py:207-232 on TPU: decode
through 8K prefill, paged & standard, GQA model shapes, window sweep —
printing a table with TFLOP/s (4*B*H*S^2*D convention), tok/s, roofline
fraction, and speed-of-light fraction for bandwidth-bound decode.

Usage: PYTHONPATH=. python benchmarks/run_grid.py [--iters N]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.flash_vjp import flash_attention_vjp
from aule_tpu.ops.paged import paged_attention
from aule_tpu.ops.quant import quantize_kv
from aule_tpu.utils.profiling import (
    attention_flops,
    benchmark,
    decode_speed_of_light_toks,
    device_peaks,
)


def make_qkv(b, hq, hkv, s, d, dtype, sk=None):
    rng = np.random.default_rng(0)
    sk = sk or s
    return (jnp.asarray(rng.standard_normal((b, hq, s, d)), dtype),
            jnp.asarray(rng.standard_normal((b, hkv, sk, d)), dtype),
            jnp.asarray(rng.standard_normal((b, hkv, sk, d)), dtype))


def bench_prefill(b, hq, hkv, s, d, dtype, causal=True, window=-1,
                  iters=20, backward=False):
    q, k, v = make_qkv(b, hq, hkv, s, d, dtype)
    if backward:
        f = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
            flash_attention_vjp(q, k, v, causal=causal,
                                window_size=window).astype(jnp.float32)),
            argnums=(0, 1, 2)))
    else:
        f = jax.jit(lambda q, k, v: flash_attention_fwd(
            q, k, v, causal=causal, window_size=window, return_lse=False,
            interpret=False))
    flops = attention_flops(b, hq, s, s, d, causal, window, backward)
    # small rows need LONG loops (>=40 ms body at an optimistic rate):
    # B1/S2048 and the window rows printed physically impossible numbers
    # (166% roofline, 0.25x window "speedup") at fixed iters=20 — the
    # t(N)-t(1) subtraction drowns in dispatch jitter (same artifact as
    # the decode rows and the fwd+bwd band; BENCH_GRID r5)
    iters = max(iters, min(2000, int(0.04 / (flops / 1.5e14)) + 1))
    dt = benchmark(f, q, k, v, iters=iters)
    return dt, flops / dt / 1e12


def bench_decode(b, hq, hkv, ctx, d, page=16, dtype=jnp.bfloat16,
                 quantized=False, window=-1, iters=20):
    rng = np.random.default_rng(0)
    npg = ctx // page
    q = jnp.asarray(rng.standard_normal((b, hq, d)), dtype)
    kf = jnp.asarray(rng.standard_normal((hkv, b * npg + 1, page, d)),
                     jnp.float32)
    vf = jnp.asarray(rng.standard_normal((hkv, b * npg + 1, page, d)),
                     jnp.float32)
    bt = jnp.asarray(1 + np.arange(b * npg, dtype=np.int32).reshape(b, npg))
    lens = jnp.full((b,), ctx, jnp.int32)
    from aule_tpu.ops.paged_fused import (
        paged_attention_fused,
        scale_rows,
        to_fused_layout,
    )

    # NOTE: pools ride as jit ARGUMENTS — closing over them embeds the
    # whole cache as HLO constants (huge compile payloads).
    if quantized:
        kq, ks = quantize_kv(kf, jnp.int8)
        vq, vs = quantize_kv(vf, jnp.int8)
        kv, sc = to_fused_layout(kq, vq, ks, vs)
        f = jax.jit(lambda q, kv, sc: paged_attention_fused(
            q, kv, bt, lens, kv_scales=sc,
            window_size=window, interpret=False))
        # payload + the packed per-page scale tile (bf16, token-major)
        tile = scale_rows(hkv, page) * 128 * 2
        bpe = 1.0 + tile / (2.0 * hkv * page * d)
        dt = benchmark(f, q, kv, sc, iters=iters)
    else:
        kv = to_fused_layout(kf.astype(dtype), vf.astype(dtype))
        f = jax.jit(lambda q, kv: paged_attention_fused(
            q, kv, bt, lens, window_size=window, interpret=False))
        bpe = jnp.dtype(dtype).itemsize
        dt = benchmark(f, q, kv, iters=iters)
    sol = decode_speed_of_light_toks(b, hkv, ctx, d, bpe)
    return dt, b / dt, (b / dt) / sol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    dev = jax.devices()[0]
    peak_tf, peak_bw = device_peaks()
    print(f"device: {dev.device_kind}  peak {peak_tf} TFLOP/s bf16, "
          f"{peak_bw} TB/s HBM\n")

    print("== prefill (bf16, causal) ==")
    print(f"{'config':<42} {'ms':>8} {'TFLOP/s':>9} {'roofline':>9}")
    grid = [
        # LLaMA-8B shape
        (1, 32, 8, 2048, 128), (1, 32, 8, 4096, 128), (1, 32, 8, 8192, 128),
        (4, 32, 8, 4096, 128),
        # LLaMA-70B shape
        (1, 64, 8, 4096, 128), (4, 64, 8, 4096, 128),
        # Mistral shape, batch 8
        (8, 32, 8, 2048, 128),
        # MHA square
        (4, 32, 32, 4096, 128),
    ]
    for b, hq, hkv, s, d in grid:
        dt, tf = bench_prefill(b, hq, hkv, s, d, jnp.bfloat16,
                               iters=args.iters)
        name = f"B{b} Hq{hq} Hkv{hkv} S{s} D{d}"
        print(f"{name:<42} {dt*1e3:8.2f} {tf:9.1f} {tf/peak_tf:8.1%}")

    print("\n== prefill fwd+bwd (bf16, causal) ==")
    for b, hq, hkv, s, d in [(1, 32, 8, 2048, 128), (4, 32, 8, 2048, 128)]:
        # fwd+bwd rows need LONG loops: at iters<=10 the t(N)-t(1)
        # subtraction drowns in dispatch jitter and medians wandered
        # 85-120 TF/s at the same shape (r4 "honest band"); at iters
        # >=20 (>=30 ms loop body) reps agree within ~5% (r5
        # reconciliation, scripts note in BENCH_GRID.md)
        dt, tf = bench_prefill(b, hq, hkv, s, d, jnp.bfloat16,
                               iters=max(20, args.iters), backward=True)
        name = f"B{b} Hq{hq} Hkv{hkv} S{s} D{d} +bwd"
        print(f"{name:<42} {dt*1e3:8.2f} {tf:9.1f} {tf/peak_tf:8.1%}")

    print("\n== sliding window speedup (B1 Hq32 Hkv8 D128, W=256) ==")
    for s in (2048, 4096, 8192):
        dt_full, _ = bench_prefill(1, 32, 8, s, 128, jnp.bfloat16,
                                   iters=args.iters)
        dt_win, _ = bench_prefill(1, 32, 8, s, 128, jnp.bfloat16,
                                  window=256, iters=args.iters)
        print(f"S={s:<6} full {dt_full*1e3:7.2f} ms  window {dt_win*1e3:7.2f}"
              f" ms  speedup {dt_full/dt_win:5.2f}x")

    print("\n== paged decode (B8, GQA 32/8, D128, page 16) ==")
    print(f"{'ctx':>6} {'dtype':>6} {'ms':>8} {'tok/s':>10} {'SoL':>7}")
    for ctx in (1024, 2048, 4096, 8192):
        for quant in (False, True):
            # sub-100us ops need LONG loops: the t(N)-t(1) subtraction
            # drowns in remote-dispatch jitter (+-ms) unless the loop
            # body totals >=50ms — short-ctx rows once printed >100% of
            # speed-of-light (r4 grid) with only 200 iters
            dt, toks, frac = bench_decode(8, 32, 8, ctx, 128,
                                          quantized=quant,
                                          iters=max(args.iters,
                                                    1_000_000 // ctx))
            label = "int8" if quant else "bf16"
            print(f"{ctx:>6} {label:>6} {dt*1e3:8.2f} {toks:10,.0f} "
                  f"{frac:6.1%}")


if __name__ == "__main__":
    main()
