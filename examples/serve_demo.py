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

# Default to CPU (interpret-mode kernels): probing for a TPU can HANG
# when a remote-attached device is unreachable, and this walkthrough is
# about the serving engine, not kernel speed.  Set AULE_DEMO_TPU=1 to
# run compiled on a real chip.
if os.environ.get("AULE_DEMO_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
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

# -- speculative decoding ---------------------------------------------------
# A small draft model proposes 3 tokens per round; the target verifies
# them in one dispatch and commits the agreeing prefix + its own next
# token.  Token-identical to plain greedy decode.
draft_cfg = llama.LlamaConfig.tiny(dim=64, n_layers=1, n_heads=2,
                                   hidden_dim=128)
draft_params = llama.init_params(draft_cfg, jax.random.key(1))
spec = ServingEngine(
    params, cfg,
    max_batch=4, page_size=16, num_pages=128, max_pages_per_seq=8,
    max_seq_len=256,
    draft_params=draft_params, draft_cfg=draft_cfg, spec_tokens=3,
)
spec.submit(a, max_new_tokens=12)
for req in spec.run():
    print(f"speculative request {req.req_id}: {req.output}")
print(f"spec acceptance: {spec.spec_accepted}/{spec.spec_drafted} "
      f"drafted tokens accepted")
