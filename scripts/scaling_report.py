"""Serving scaling report: tokens/s at 1..N engine replicas.

The BASELINE north star measures decode tokens/s scaling at 1 chip /
1 host / N hosts.  This harness drives the engine-replica pool
(aule_tpu/serving/multihost.py) over a fixed request workload at each
replica count and reports aggregate tokens/s + scaling efficiency.

On a multi-host fleet each replica owns its own chip(s) and the numbers
measure real DCN-free decode scaling; on this single-chip environment the
replicas time-share one device, so the printed efficiency measures
scheduler overhead only (run with --interpret for a CPU smoke).

Usage: python scripts/scaling_report.py [--replicas 1 2 4] [--requests 16]
       python scripts/scaling_report.py --processes [--transport tcp]
         (process-per-replica pool over mp queues or the TCP wire;
          CPU workers, so scaling measures the pool+transport overhead
          against real process parallelism)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine
from aule_tpu.serving.multihost import EngineReplicaPool


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=32)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--processes", action="store_true",
                    help="process-per-replica pool (CPU workers)")
    ap.add_argument("--transport", choices=["mp", "tcp"], default="mp")
    args = ap.parse_args()
    if args.processes:
        return run_processes(args)

    cfg = llama.LlamaConfig(
        vocab_size=2048, dim=512, n_layers=args.layers, n_heads=8,
        n_kv_heads=2, hidden_dim=1024,
        dtype=jax.numpy.bfloat16
        if jax.devices()[0].platform == "tpu" else jax.numpy.float32)
    params = llama.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, size=int(n)).astype(np.int32)
               for n in rng.integers(8, 64, size=args.requests)]

    base = None
    for n in args.replicas:
        pool = EngineReplicaPool([
            ServingEngine(params, cfg, max_batch=4, page_size=16,
                          num_pages=512, max_pages_per_seq=16,
                          max_seq_len=512)
            for _ in range(n)
        ])
        for p in prompts:
            pool.submit(p, max_new_tokens=args.new_tokens)
        done = pool.run()
        assert len(done) == len(prompts)
        tps = pool.stats.tokens_per_s
        if base is None:
            base = tps
        print(f"replicas={n}: {pool.stats.tokens} tokens in "
              f"{pool.stats.wall_s:.2f}s = {tps:,.0f} tok/s "
              f"(scaling {tps / base / n * 100:.0f}% of linear)")


def run_processes(args):
    import time

    # process mode measures pool+transport overhead with CPU workers by
    # design; pin the parent to CPU too so the direct baseline is
    # comparable (and so a remote-TPU tunnel outage can't hang jax init)
    import jax as _jaxp
    _jaxp.config.update("jax_platforms", "cpu")

    from aule_tpu.serving.multihost import MultiProcessServingPool

    rng = np.random.default_rng(0)
    # uniform prompt shape: per-worker prefill compiles are warmed at
    # worker startup, so the timed window is pure serving
    prompts = [rng.integers(0, 2048, size=32).astype(np.int32)
               for _ in range(args.requests)]
    engine_kw = dict(max_batch=4, page_size=16, num_pages=256,
                     max_pages_per_seq=16, max_seq_len=512)
    cores = os.cpu_count() or 1
    if cores < max(args.replicas):
        print(f"NOTE: {cores} CPU core(s) < {max(args.replicas)} "
              f"replicas - wall-clock scaling is core-bound on this "
              f"machine; the meaningful numbers here are pool/transport "
              f"OVERHEAD (procs=1 vs direct) and mp-vs-tcp parity.  On "
              f"a real fleet each replica owns its own host/chips.")
    # direct single-engine baseline (no pool, no processes)
    import jax as _jax

    from aule_tpu.models import llama as _llama
    _cfg = _llama.LlamaConfig.tiny()
    _eng_params = _llama.init_params(_cfg, _jax.random.key(0))
    _eng = ServingEngine(_eng_params, _cfg, **engine_kw)
    _eng.submit(np.zeros(32, np.int32), args.new_tokens)
    _eng.run()
    t0 = time.perf_counter()
    for p_ in prompts:
        _eng.submit(p_, max_new_tokens=args.new_tokens)
    direct = sum(len(r.output) for r in _eng.run())
    ddt = time.perf_counter() - t0
    print(f"direct 1 engine: {direct} tokens in {ddt:.2f}s = "
          f"{direct / ddt:,.0f} tok/s")

    base = None
    for n in args.replicas:
        pool = MultiProcessServingPool(
            n, engine_kw, model_seed=0, transport=args.transport,
            warm={"lens": [32], "new_tokens": args.new_tokens},
            worker_env={
                # pin each CPU replica to 2 intra-op threads so N
                # replicas on ONE test machine exercise real process
                # parallelism instead of contending for every core
                "XLA_FLAGS": "--xla_cpu_multi_thread_eigen=false "
                             "intra_op_parallelism_threads=2",
                "OMP_NUM_THREADS": "2",
                "OPENBLAS_NUM_THREADS": "2",
            })
        try:
            t0 = time.perf_counter()
            for p in prompts:
                pool.submit(p, max_new_tokens=args.new_tokens)
            got = pool.collect(timeout_s=600)
            dt = time.perf_counter() - t0
        finally:
            pool.shutdown()
        toks = sum(len(v[1]) for v in got.values())
        tps = toks / dt
        if base is None:
            base = tps
        print(f"procs={n} ({args.transport}): {toks} tokens in "
              f"{dt:.2f}s = {tps:,.0f} tok/s "
              f"(scaling {tps / base / n * 100:.0f}% of linear)")


if __name__ == "__main__":
    main()
