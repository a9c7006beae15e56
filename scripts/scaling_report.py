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
    args = ap.parse_args()

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


if __name__ == "__main__":
    main()
