"""Speculative-decoding serving probe (run on a real chip).

Measures end-to-end ServingEngine tok/s for plain greedy decode vs
speculative decode at several K, with two draft models bracketing the
real-world envelope:

  * self-draft (draft == target): acceptance = 100%, so the speedup is
    the engine-mechanics upper bound  (K+1 committed tokens per
    target dispatch, minus draft+verify cost);
  * random tiny draft: acceptance ~ 1/vocab, the lower bound — measures
    how much a useless draft costs.

A production draft (distilled / pruned) lands between the two; the
acceptance column lets you interpolate.  Usage:

    timeout 900 python scripts/probe_spec_decode.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine

# mid-sized target: big enough that a decode step is device-bound,
# small enough to init over the tunnel in seconds
CFG = llama.LlamaConfig(vocab_size=32000, dim=1024, n_layers=8,
                        n_heads=16, n_kv_heads=8, hidden_dim=2816)
DRAFT_CFG = llama.LlamaConfig(vocab_size=32000, dim=512, n_layers=2,
                              n_heads=8, n_kv_heads=4, hidden_dim=1408)
# realistic mid-point draft.  With RANDOM weights there is no trained
# structure for a smaller model to share, so the usual proxies fail:
# layer truncation measured acceptance 16/1008 (~random — each random
# layer scrambles the residual stream), and no pretrained checkpoints
# exist in this zero-egress image.  A noise-perturbed copy of the
# target is the honest synthetic stand-in: its logits correlate with
# the target's exactly the way a distilled draft's do, and sigma tunes
# the acceptance to the production-typical band (the r5 row uses
# sigma=0.01 => ~70-80% acceptance).  Full draft cost is still paid
# (same architecture), so the speedup is CONSERVATIVE vs a real
# smaller draft at equal acceptance.
NOISE_SIGMA = 0.01


def noised_draft(params, key=42):
    import jax.numpy as jnp
    ks = jax.random.split(jax.random.key(key), 1000)
    i = [0]

    def noise(x):
        if x.ndim < 2:
            return x
        i[0] += 1
        return (x + NOISE_SIGMA * jnp.std(x.astype(jnp.float32))
                * jax.random.normal(ks[i[0]], x.shape, jnp.float32)
                ).astype(x.dtype)

    return jax.tree_util.tree_map(noise, params)

BATCH = 4
PROMPT = 128
GEN = 128


def run(params, tag, **kw):
    eng = ServingEngine(params, CFG, max_batch=BATCH, page_size=16,
                        num_pages=BATCH * 24 + 8, max_pages_per_seq=24,
                        max_seq_len=2048, decode_steps=1, **kw)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, CFG.vocab_size, size=PROMPT).astype(np.int32)
               for _ in range(BATCH)]
    # warmup round (compiles every executable) on a throwaway request set
    for p in prompts:
        eng.submit(p, max_new_tokens=8)
    eng.run()
    for p in prompts:
        eng.submit(p, max_new_tokens=GEN)
    t0 = time.perf_counter()
    done = eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(r.output) for r in done)
    acc = (f" acceptance={eng.spec_accepted}/{eng.spec_drafted}"
           if eng.spec_tokens else "")
    print(f"{tag}: {toks} tokens in {dt:.2f}s = {toks / dt:,.0f} tok/s"
          f"{acc}", flush=True)
    return toks / dt, done


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    params = llama.init_params(CFG, jax.random.key(0))
    draft_params = llama.init_params(DRAFT_CFG, jax.random.key(1))

    base, want = run(params, "plain greedy")

    def match_rate(got):
        """Per-token prefix agreement with the plain-greedy streams.

        On chip this is NOT asserted to be 1.0: the verify computes
        per-position logits with the chunked-prefill kernel while plain
        decode uses the decode kernel, and their different reduction
        orders can flip argmax on near-tie logits (the CPU suite pins
        bitwise token identity in exact arithmetic, where both kernels
        agree; r4 chip observation: self-draft acceptance 347/366, i.e.
        ~5% of proposals sit on ties at these random-weights logits).
        Both streams are valid greedy decodes of the same model within
        kernel numerics — the same caveat production GPU serving stacks
        carry for speculative decoding."""
        same = total = 0
        for g, w in zip(got, want):
            for a, b in zip(g.output, w.output):
                total += 1
                if a != b:
                    break
                same += 1
        return same / max(total, 1)

    noisy = noised_draft(params)
    for k in (2, 4):
        ts, got = run(params, f"spec K={k} self-draft",
                      draft_params=params, draft_cfg=CFG, spec_tokens=k)
        mr = match_rate(got)
        print(f"  -> self-draft speedup {ts / base:.2f}x  "
              f"greedy-prefix match {mr:.1%}")
        assert mr > 0.5, mr
        ts, got = run(params, f"spec K={k} noised-draft",
                      draft_params=noisy, draft_cfg=CFG,
                      spec_tokens=k)
        mr = match_rate(got)
        print(f"  -> noised-draft speedup {ts / base:.2f}x  "
              f"greedy-prefix match {mr:.1%}")
        ts, got = run(params, f"spec K={k} random-draft",
                      draft_params=draft_params, draft_cfg=DRAFT_CFG,
                      spec_tokens=k)
        mr = match_rate(got)
        print(f"  -> random-draft speedup {ts / base:.2f}x  "
              f"greedy-prefix match {mr:.1%}")


if __name__ == "__main__":
    main()
