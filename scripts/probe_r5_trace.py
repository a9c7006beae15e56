"""r5 verdict item 2: trace-attribute the causal MFU gap.

Captures a jax.profiler trace of the strips=2 diagonal causal kernel at
B4/S4096 and B8/S2048 (the two worst production rows, BENCH_GRID r4),
then parses the trace.json.gz event stream directly (no xprof needed)
to split wall time into per-op device buckets.
"""

import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aule_tpu.ops.flash import flash_attention_fwd  # noqa: E402

TRACE_DIR = "/tmp/r5_trace"


def run_shape(batch, hq, hkv, seq, d=128, iters=30):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((batch, hq, seq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, hkv, seq, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, hkv, seq, d)), jnp.bfloat16)

    fn = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=True, return_lse=False))
    out = fn(q, k, v)
    out.block_until_ready()

    tag = f"B{batch}_S{seq}"
    tdir = os.path.join(TRACE_DIR, tag)
    jax.profiler.start_trace(tdir)
    for _ in range(iters):
        out = fn(q, k, v)
    out.block_until_ready()
    jax.profiler.stop_trace()
    time.sleep(1)
    return tdir, iters


def parse_trace(tdir, iters):
    files = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print(f"  NO TRACE FILES under {tdir}")
        for f in glob.glob(os.path.join(tdir, "**", "*"), recursive=True):
            print("   ", f)
        return
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # bucket complete events (ph == 'X') by pid/tid track name
    tracks = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tracks[(e["pid"], e.get("tid"))] = e["args"]["name"]
    buckets = {}
    names = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        track = tracks.get((e.get("pid"), e.get("tid")), "?")
        dur = e.get("dur", 0)
        buckets[track] = buckets.get(track, 0) + dur
        key = (track, e.get("name", "?"))
        names[key] = names.get(key, 0) + dur
    print("  tracks (total us):")
    for t, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"    {t:40s} {us/iters:10.1f} us/iter")
    print("  top ops:")
    for (t, n), us in sorted(names.items(), key=lambda kv: -kv[1])[:25]:
        print(f"    [{t[:24]:24s}] {n[:60]:60s} {us/iters:9.1f} us/iter")


if __name__ == "__main__":
    os.makedirs(TRACE_DIR, exist_ok=True)
    for shape in [(4, 32, 8, 4096), (8, 32, 8, 2048)]:
        b, hq, hkv, s = shape
        print(f"=== B{b} Hq{hq} Hkv{hkv} S{s} ===")
        try:
            tdir, iters = run_shape(b, hq, hkv, s)
            parse_trace(tdir, iters)
        except Exception as ex:
            print(f"  trace failed: {ex!r}")
