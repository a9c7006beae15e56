"""Headline benchmark: prints ONE JSON line for the driver.

Mirrors the reference's benchmark grid (tests/benchmark_mi300x.py:207-232):
Llama-70B/8B-shaped GQA attention.  Headline metric = PagedAttention decode
throughput at batch=8, 4K context (reference MI300X baseline: 10,915 tok/s,
python/README.md:31).  Secondary metrics (prefill TFLOP/s, int8-KV decode,
window speedup) go to stderr.

Timing: host-side timing through the remote-device transport is unreliable
(block_until_ready can ack before the device finishes; per-dispatch jitter
is ~ms), so every measurement runs the op inside ONE jitted lax.fori_loop
with a dynamic trip count and a scalar readback (scripts/devtime.py) and
reports (t(N) - t(1)) / (N - 1).

FLOP convention matches the reference: 4*B*H*S^2*D (benchmark_mi300x.py:
65-73), halved for causal.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))

from devtime import devtime  # noqa: E402

from aule_tpu.ops.flash import flash_attention_fwd  # noqa: E402
from aule_tpu.ops.paged import paged_attention  # noqa: E402
from aule_tpu.ops.quant import quantize_kv  # noqa: E402

BASELINE_DECODE_TOKS = 10915.0  # MI300X, batch=8, 4K ctx (README.md:31)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_decode(batch=8, hq=32, hkv=8, d=128, ctx=4096, page=16,
                 dtype=jnp.bfloat16, quantized=False, fused=True,
                 ppcb=None, n_iters=100):
    # quantized: False | True (int8) | a payload dtype (e.g. fp8 e4m3)
    qdt = (quantized if quantized not in (False, True) else jnp.int8)
    rng = np.random.default_rng(0)
    n_pages_seq = ctx // page
    num_pages = batch * n_pages_seq + 1
    q = jnp.asarray(rng.standard_normal((batch, hq, d)), dtype)
    kf = jnp.asarray(
        rng.standard_normal((hkv, num_pages, page, d)), jnp.float32)
    vf = jnp.asarray(
        rng.standard_normal((hkv, num_pages, page, d)), jnp.float32)
    bt = jnp.asarray(
        1 + np.arange(batch * n_pages_seq, dtype=np.int32).reshape(
            batch, n_pages_seq))
    lens = jnp.full((batch,), ctx, jnp.int32)
    if ppcb is None:
        ppcb = 32 if fused else 8

    # pools ride as jit ARGUMENTS: closing over device arrays embeds
    # them as HLO constants (huge compile payloads through the tunnel)
    if fused:
        from aule_tpu.ops.paged_fused import (
            paged_attention_fused,
            to_fused_layout,
        )

        if quantized is not False:
            kq, ks = quantize_kv(kf, qdt)
            vq, vs = quantize_kv(vf, qdt)
            kv, sc = to_fused_layout(kq, vq, ks, vs)
            fn = jax.jit(lambda q, kv, sc: paged_attention_fused(
                q, kv, bt, lens, kv_scales=sc,
                pages_per_compute_block=ppcb, interpret=False))
            dt = devtime(fn, q, kv, sc, n_iters=n_iters)
        else:
            kv = to_fused_layout(kf.astype(dtype), vf.astype(dtype))
            fn = jax.jit(lambda q, kv: paged_attention_fused(
                q, kv, bt, lens, pages_per_compute_block=ppcb,
                interpret=False))
            dt = devtime(fn, q, kv, n_iters=n_iters)
    elif quantized is not False:
        kq, ks = quantize_kv(kf, qdt)
        vq, vs = quantize_kv(vf, qdt)
        fn = jax.jit(lambda q, kq, vq, ks, vs: paged_attention(
            q, kq, vq, bt, lens, k_scales=ks, v_scales=vs,
            pages_per_compute_block=ppcb, interpret=False))
        dt = devtime(fn, q, kq, vq, ks, vs, n_iters=n_iters)
    else:
        kc, vc = kf.astype(dtype), vf.astype(dtype)
        fn = jax.jit(lambda q, kc, vc: paged_attention(
            q, kc, vc, bt, lens, pages_per_compute_block=ppcb,
            interpret=False))
        dt = devtime(fn, q, kc, vc, n_iters=n_iters)
    return batch / dt, dt


def bench_prefill(batch=4, hq=32, hkv=8, s=4096, d=128,
                  dtype=jnp.bfloat16, window=-1, n_iters=20):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((batch, hq, s, d)), dtype)
    k = jnp.asarray(rng.standard_normal((batch, hkv, s, d)), dtype)
    v = jnp.asarray(rng.standard_normal((batch, hkv, s, d)), dtype)
    fn = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=True, window_size=window, return_lse=False,
        interpret=False))
    dt = devtime(fn, q, k, v, n_iters=n_iters)
    flops = 4 * batch * hq * s * s * d * 0.5  # causal
    if window > 0:
        flops *= min(1.0, 2.0 * window / s)
    return flops / dt / 1e12, dt


def bench_fwd_bwd(batch=4, hq=32, hkv=8, s=2048, d=128, n_iters=20):
    # n_iters>=20: shorter loops drown t(N)-t(1) in dispatch jitter
    # (the r4 85-120 TF/s "honest band" was an under-repeating
    # artifact; r5 reconciliation in BENCH_GRID.md)
    from aule_tpu.ops.flash_vjp import flash_attention_vjp

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((batch, hq, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, hkv, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, hkv, s, d)), jnp.bfloat16)

    def fwd_bwd(q, k, v):
        def loss(q, k, v):
            return jnp.sum(flash_attention_vjp(
                q, k, v, causal=True).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    dt = devtime(jax.jit(fwd_bwd), q, k, v, n_iters=n_iters)
    flops = 4 * batch * hq * s * s * d * 0.5 * 3.5  # fwd + 2.5x bwd
    return flops / dt / 1e12, dt


def _probe_devices(timeout_s=600):
    """jax.devices() can block FOREVER when the remote-attached TPU's
    tunnel is down; probe it on a daemon thread so bench.py fails loudly
    within a bounded time instead of hanging the driver."""
    import threading

    out = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # pragma: no cover - init failure path
            out["error"] = repr(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" in out:
        return out["devices"]
    log(f"FATAL: jax.devices() did not return within {timeout_s}s "
        f"({out.get('error', 'device tunnel down?')})")
    os._exit(1)  # the probe thread is wedged in native code


def main():
    dev = _probe_devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        log("WARNING: no TPU; emitting null result")
        print(json.dumps({"metric": "paged_decode_tokens_per_s",
                          "value": 0.0, "unit": "tok/s",
                          "vs_baseline": 0.0}))
        return

    try:
        toks, dt = bench_decode(dtype=jnp.bfloat16, fused=True)
    except Exception as e:  # pragma: no cover - headline must survive
        log(f"fused decode failed ({e!r:.200}); retrying with "
            f"AULE_DECODE_XBATCH=0")
        os.environ["AULE_DECODE_XBATCH"] = "0"
        toks, dt = bench_decode(dtype=jnp.bfloat16, fused=True)
    log(f"paged decode bf16 fused B8 ctx4096: {toks:,.0f} tok/s "
        f"({dt*1e3:.3f} ms)")

    try:
        toks_i8, dt_i8 = bench_decode(quantized=True, fused=True)
        log(f"paged decode int8 fused B8 ctx4096: {toks_i8:,.0f} tok/s "
            f"({dt_i8*1e3:.3f} ms)")
    except Exception as e:  # pragma: no cover
        log(f"int8 decode failed: {e!r:.300}")

    try:
        toks_f8, dt_f8 = bench_decode(quantized=jnp.float8_e4m3fn,
                                      fused=True)
        log(f"paged decode fp8-e4m3 fused B8 ctx4096: {toks_f8:,.0f} "
            f"tok/s ({dt_f8*1e3:.3f} ms)")
    except Exception as e:  # pragma: no cover
        log(f"fp8 decode failed: {e!r:.300}")

    try:
        toks_hm, dt_hm = bench_decode(dtype=jnp.bfloat16, fused=False)
        log(f"paged decode bf16 vLLM-layout B8 ctx4096: {toks_hm:,.0f} "
            f"tok/s ({dt_hm*1e3:.3f} ms)")
    except Exception as e:  # pragma: no cover
        log(f"head-major decode failed: {e!r:.300}")

    try:
        try:
            tf, dtp = bench_prefill()
        except Exception as e:  # pragma: no cover
            log(f"prefill failed ({e!r:.200}); retrying with "
                f"AULE_FLASH_MONO=0 AULE_FLASH_DIAG=0")
            os.environ["AULE_FLASH_MONO"] = "0"
            os.environ["AULE_FLASH_DIAG"] = "0"
            tf, dtp = bench_prefill()
        log(f"prefill bf16 B4 H32/8 S4096 D128 causal: {tf:.1f} TFLOP/s "
            f"({dtp*1e3:.2f} ms)")
        tf_w, _ = bench_prefill(window=256)
        log(f"prefill window=256: {tf_w:.1f} TFLOP/s (effective)")
    except Exception as e:  # pragma: no cover
        log(f"prefill bench failed: {e!r:.300}")

    try:
        tb, dtb = bench_fwd_bwd()
        log(f"fwd+bwd bf16 B4 H32/8 S2048 causal: {tb:.1f} TFLOP/s eff "
            f"({dtb*1e3:.2f} ms)")
    except Exception as e:  # pragma: no cover
        log(f"fwd+bwd bench failed: {e!r:.300}")

    print(json.dumps({
        "metric": "paged_decode_tokens_per_s_b8_ctx4096",
        "value": round(toks, 1),
        "unit": "tok/s",
        "vs_baseline": round(toks / BASELINE_DECODE_TOKS, 3),
    }))


if __name__ == "__main__":
    main()
