"""Profiling and roofline instrumentation.

The reference times ad hoc with perf_counter and computes TFLOPs as
4*B*H*S^2*D against published device peaks (tests/benchmark_mi300x.py:65-73,
196-197).  Here that convention is kept for comparability, plus jax.profiler
tracing and a per-TPU-generation peak table for roofline fractions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp

# (bf16 matmul TFLOP/s, HBM TB/s) per chip.  Public spec-sheet numbers.
DEVICE_PEAKS = {
    "v4": (275.0, 1.2),
    "v5 lite": (197.0, 0.82),
    "v5e": (197.0, 0.82),
    "v5p": (459.0, 2.76),
    "v6 lite": (918.0, 1.64),
    "v6e": (918.0, 1.64),
    "default": (197.0, 0.82),
}


def device_peaks(device_kind: Optional[str] = None):
    if device_kind is None:
        device_kind = jax.devices()[0].device_kind
    dk = device_kind.lower()
    for key, peaks in DEVICE_PEAKS.items():
        if key != "default" and key in dk:
            return peaks
    return DEVICE_PEAKS["default"]


def attention_flops(batch: int, heads: int, seq_q: int, seq_k: int,
                    head_dim: int, causal: bool = False,
                    window: int = -1, backward: bool = False) -> float:
    """Reference FLOP convention: 4*B*H*Sq*Sk*D (benchmark_mi300x.py:65-73),
    halved for causal, scaled for windows; backward multiplies by 2.5
    (dq+dk+dv recompute)."""
    flops = 4.0 * batch * heads * seq_q * seq_k * head_dim
    if window > 0 and seq_k > 0:
        flops *= min(1.0, (window + 1) / seq_k if causal
                     else (2 * window + 1) / seq_k)
    elif causal:
        flops *= 0.5
    if backward:
        flops *= 2.5
    return flops


def roofline_fraction(achieved_tflops: float,
                      device_kind: Optional[str] = None) -> float:
    peak, _ = device_peaks(device_kind)
    return achieved_tflops / peak


def decode_speed_of_light_toks(batch: int, heads_kv: int, ctx: int,
                               head_dim: int, bytes_per_elt: float,
                               device_kind: Optional[str] = None) -> float:
    """Decode is HBM-bound: upper-bound tok/s = BW / (KV bytes per token).

    KV bytes per decode step = B * ctx * Hkv * D * bytes * 2 (K and V)."""
    _, bw_tbs = device_peaks(device_kind)
    kv_bytes = batch * ctx * heads_kv * head_dim * bytes_per_elt * 2
    return batch * (bw_tbs * 1e12) / kv_bytes


def benchmark(fn, *args, warmup: int = 3, iters: int = 20,
              reps: int = 3, return_spread: bool = False):
    """On-device per-iteration timing.

    Host-side timing around individual dispatches is unreliable on
    remote-attached devices (block_until_ready can ack before the device
    finishes; per-dispatch latency jitter is ~ms), so the op runs inside
    ONE jitted lax.fori_loop with a dynamic trip count and a scalar
    readback; reported time is median over reps of
    (t(iters) - t(1)) / (iters - 1).  The loop perturbs the first
    argument with `carry * 0` — a float multiply XLA cannot fold
    (NaN/Inf semantics) — which defeats loop-invariant code motion and
    serializes iterations via the carry chain.  (`warmup` is accepted
    for signature compatibility; the loop self-warms.)
    """
    del warmup
    args = list(args)
    first, rest = args[0], args[1:]

    def loop(n, first, *rest):
        def body(i, carry):
            eps = (carry * 0.0).astype(first.dtype)
            x = first + eps.reshape((1,) * first.ndim)
            o = fn(x, *rest)
            leaf = jax.tree_util.tree_leaves(o)[0]
            return carry + leaf.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jloop = jax.jit(loop)
    n1 = jnp.int32(1)
    nN = jnp.int32(iters)
    float(jloop(n1, first, *rest))
    float(jloop(nN, first, *rest))
    results = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jloop(n1, first, *rest))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jloop(nN, first, *rest))
        tN = time.perf_counter() - t0
        results.append((tN - t1) / (iters - 1))
    results.sort()
    med = results[len(results) // 2]
    if return_spread:
        return med, (results[0], results[-1])
    return med


@contextlib.contextmanager
def trace(path: str):
    """jax.profiler trace context (view in xprof/tensorboard)."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
