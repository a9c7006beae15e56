"""Serving walkthrough: one engine, every serving feature at once.

Runs on CPU (interpret mode) or a real TPU unchanged:

    python examples/serve_demo.py

Demonstrates: continuous batching, chunked prefill, automatic prefix
caching (second request shares the first's prompt pages), per-request
temperature in a mixed batch, streaming token callbacks, int8 KV
(quantized=True), and checkpoint/resume.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if jax.devices()[0].platform != "tpu":
    os.environ.setdefault("AULE_TPU_INTERPRET", "1")

import numpy as np

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine

cfg = llama.LlamaConfig.tiny()
params = llama.init_params(cfg, jax.random.key(0))

eng = ServingEngine(
    params, cfg,
    max_batch=4, page_size=16, num_pages=128, max_pages_per_seq=8,
    max_seq_len=256,
    prefill_chunk=16,           # chunked prefill: one compile, any length
    enable_prefix_cache=True,   # shared prompt prefixes reuse KV pages
    quantized=True,             # int8 KV on the int8 MXU
)

rng = np.random.default_rng(0)
system_prompt = rng.integers(0, 256, size=32).astype(np.int32)


def stream(rid, tok):
    print(f"  [stream] request {rid} -> token {tok}")


# two requests sharing the system prompt; one greedy, one sampled
a = np.concatenate([system_prompt,
                    rng.integers(0, 256, size=6).astype(np.int32)])
b = np.concatenate([system_prompt,
                    rng.integers(0, 256, size=9).astype(np.int32)])
eng.submit(a, max_new_tokens=6, on_token=stream)
eng.submit(b, max_new_tokens=6, temperature=1.2, on_token=stream)

for req in eng.run():
    kind = "greedy" if req.temperature == 0 else f"T={req.temperature}"
    print(f"request {req.req_id} ({kind}): {req.output}")
print(f"prefix-cache hit tokens: {eng.prefix_cache_hit_tokens}")
