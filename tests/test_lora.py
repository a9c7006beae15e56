"""Multi-LoRA serving: per-request adapters over one base model.

Correctness bar: a request on adapter X must decode exactly like an
engine whose weights have X merged in (W + A@B), while co-batched base
(and other-adapter) requests are untouched — one executable, per-row
adapter gathers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine

CFG = llama.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.key(0))


def make_adapter(key, rank=4, targets=("wq", "wo"), scale=0.2):
    qkv = CFG.n_heads * CFG.head_dim
    dims = {"wq": (CFG.dim, qkv),
            "wk": (CFG.dim, CFG.n_kv_heads * CFG.head_dim),
            "wv": (CFG.dim, CFG.n_kv_heads * CFG.head_dim),
            "wo": (qkv, CFG.dim)}
    layers = []
    for _ in range(CFG.n_layers):
        entry = {}
        for t in targets:
            key, k1, k2 = jax.random.split(key, 3)
            d_in, d_out = dims[t]
            entry[t] = (
                jax.random.normal(k1, (d_in, rank), jnp.float32) * scale,
                jax.random.normal(k2, (rank, d_out), jnp.float32) * scale)
        layers.append(entry)
    return {"layers": layers}


def merge(params, adapter):
    """Base params with the adapter folded in (W + A@B)."""
    out = dict(params)
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        nl = dict(layer)
        for t, (a, b) in adapter["layers"][li].items():
            nl[t] = (layer[t].astype(jnp.float32) + a @ b).astype(
                layer[t].dtype)
        out["layers"].append(nl)
    return out


def run(params, prompts, reqs, **engine_kw):
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, **engine_kw)
    ids = [eng.submit(p, **kw) for p, kw in zip(prompts, reqs)]
    done = {r.req_id: r for r in eng.run()}
    return [done[i].output for i in ids]


def test_lora_matches_merged_weights(params):
    adapter = make_adapter(jax.random.key(1))
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=7).astype(np.int32)
    kw = dict(max_new_tokens=6)

    base = run(params, [prompt], [kw])[0]
    want = run(merge(params, adapter), [prompt], [kw])[0]
    assert want != base  # the adapter actually changes the stream

    got = run(params, [prompt], [dict(kw, lora="x")],
              lora_params={"x": adapter})[0]
    assert got == want
    # and a base request on the SAME engine still matches base
    got0 = run(params, [prompt], [kw], lora_params={"x": adapter})[0]
    assert got0 == base


def test_mixed_batch_adapters_independent(params):
    """Base + two different adapters co-batched: each request matches
    its solo merged-weights run."""
    a1 = make_adapter(jax.random.key(2))
    a2 = make_adapter(jax.random.key(3), targets=("wq", "wv", "wo"))
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (7, 9)]
    kw = dict(max_new_tokens=5)

    want1 = run(merge(params, a1), [prompts[0]], [kw])[0]
    want2 = run(merge(params, a2), [prompts[1]], [kw])[0]

    got = run(params, prompts,
              [dict(kw, lora="one"), dict(kw, lora="two")],
              lora_params={"one": a1, "two": a2})
    assert got == [want1, want2]


@pytest.mark.slow
def test_lora_with_chunked_prefill_and_spec(params):
    adapter = make_adapter(jax.random.key(4))
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 256, size=19).astype(np.int32)
    kw = dict(max_new_tokens=6)
    want = run(merge(params, adapter), [prompt], [kw])[0]

    got = run(params, [prompt], [dict(kw, lora="x")],
              lora_params={"x": adapter}, prefill_chunk=8)[0]
    assert got == want

    draft = llama.init_params(
        llama.LlamaConfig.tiny(dim=64, n_layers=1, n_heads=2,
                               hidden_dim=128), jax.random.key(7))
    got = run(params, [prompt], [dict(kw, lora="x")],
              lora_params={"x": adapter},
              draft_params=draft,
              draft_cfg=llama.LlamaConfig.tiny(dim=64, n_layers=1,
                                               n_heads=2,
                                               hidden_dim=128),
              spec_tokens=2)[0]
    assert got == want


def test_lora_validation(params):
    adapter = make_adapter(jax.random.key(5))
    eng = ServingEngine(params, CFG, max_batch=1, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, lora_params={"x": adapter})
    with pytest.raises(ValueError, match="unknown LoRA"):
        eng.submit(np.asarray([1, 2], np.int32), 4, lora="nope")


# ---------------------------------------------------------------------------
# multi-LoRA beyond the Llama family (round-4; r3 verdict item 5: the
# engine rejected GPT-2/MoE).  Same exactness bar: adapter request ==
# merged-weights engine, co-batched base request untouched.
# ---------------------------------------------------------------------------

def _family_adapter(key, dims, n_layers, rank=4, scale=0.2):
    layers = []
    for _ in range(n_layers):
        entry = {}
        for t, (d_in, d_out) in dims.items():
            key, k1, k2 = jax.random.split(key, 3)
            entry[t] = (
                jax.random.normal(k1, (d_in, rank), jnp.float32) * scale,
                jax.random.normal(k2, (rank, d_out), jnp.float32) * scale)
        layers.append(entry)
    return {"layers": layers}


def _run_family(model, params, cfg, prompts, reqs, **engine_kw):
    eng = ServingEngine(params, cfg, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, model=model, **engine_kw)
    ids = [eng.submit(p, **kw) for p, kw in zip(prompts, reqs)]
    done = {r.req_id: r for r in eng.run()}
    return [done[i].output for i in ids]


def test_lora_gpt2_matches_merged_weights():
    """GPT-2's fused qkv-major weight takes per-projection adapters:
    wq/wk/wv map onto w_qkv[0..2] columns, wo onto w_proj."""
    from aule_tpu.models import gpt2

    cfg = gpt2.GPT2Config.tiny()
    params = gpt2.init_params(cfg, jax.random.key(11))
    adapter = _family_adapter(
        jax.random.key(12),
        {"wq": (cfg.dim, cfg.dim), "wv": (cfg.dim, cfg.dim),
         "wo": (cfg.dim, cfg.dim)}, cfg.n_layers)

    merged = dict(params)
    merged["layers"] = []
    slot = {"wq": 0, "wk": 1, "wv": 2}
    for li, layer in enumerate(params["layers"]):
        nl = dict(layer)
        w = jnp.asarray(layer["w_qkv"], jnp.float32)
        for t, (a, b) in adapter["layers"][li].items():
            if t == "wo":
                nl["w_proj"] = (layer["w_proj"].astype(jnp.float32)
                                + a @ b).astype(layer["w_proj"].dtype)
            else:
                w = w.at[slot[t]].add(a @ b)
        nl["w_qkv"] = w.astype(layer["w_qkv"].dtype)
        merged["layers"].append(nl)

    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 256, size=9).astype(np.int32)
    kw = dict(max_new_tokens=6)
    base = _run_family(gpt2, params, cfg, [prompt], [kw])[0]
    want = _run_family(gpt2, merged, cfg, [prompt], [kw])[0]
    assert want != base

    got = _run_family(gpt2, params, cfg, [prompt, prompt],
                      [dict(kw, lora="x"), kw],
                      lora_params={"x": adapter}, prefill_chunk=8)
    assert got == [want, base]


def test_lora_moe_matches_merged_weights():
    from aule_tpu.models import moe

    cfg = moe.MoEConfig.tiny()
    params = moe.init_params(cfg, jax.random.key(13))
    qkv = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    adapter = _family_adapter(
        jax.random.key(14),
        {"wq": (cfg.dim, qkv), "wk": (cfg.dim, kvd), "wo": (qkv, cfg.dim)},
        cfg.n_layers)
    merged = merge(params, adapter)  # same wq/wk/wv/wo keys as llama

    rng = np.random.default_rng(8)
    prompt = rng.integers(0, 256, size=7).astype(np.int32)
    kw = dict(max_new_tokens=5)
    base = _run_family(moe, params, cfg, [prompt], [kw])[0]
    want = _run_family(moe, merged, cfg, [prompt], [kw])[0]
    assert want != base

    got = _run_family(moe, params, cfg, [prompt, prompt],
                      [dict(kw, lora="x"), kw],
                      lora_params={"x": adapter})
    assert got == [want, base]


def test_prefix_cache_is_lora_aware(params):
    """KV pages computed under an adapter's wk/wv deltas must never be
    reused by base (or other-adapter) requests with the same prompt —
    the adapter name seeds the page-hash chain (code-review r3:
    confirmed contamination)."""
    adapter = make_adapter(jax.random.key(8), targets=("wk", "wv"))
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 256, size=36).astype(np.int32)  # 2 pages
    kw = dict(max_new_tokens=6)
    base_alone = run(params, [prompt], [kw])[0]

    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, prefill_chunk=16,
                        enable_prefix_cache=True,
                        lora_params={"x": adapter})
    r_lora = eng.submit(prompt, max_new_tokens=6, lora="x")
    done = {r.req_id: r for r in eng.run()}
    r_base = eng.submit(prompt, max_new_tokens=6)  # same prompt, base
    done.update({r.req_id: r for r in eng.run()})
    assert done[r_base].output == base_alone
    assert done[r_lora].output != base_alone
    # same-adapter resubmission DOES hit the cache
    hits0 = eng.prefix_cache_hit_tokens
    eng.submit(prompt, max_new_tokens=4, lora="x")
    eng.run()
    assert eng.prefix_cache_hit_tokens > hits0


def test_unsupported_lora_target_rejected(params):
    bad = make_adapter(jax.random.key(9))
    bad["layers"][0]["w_gate"] = bad["layers"][0]["wq"]
    with pytest.raises(ValueError, match="unsupported LoRA targets"):
        ServingEngine(params, CFG, max_batch=1, page_size=16,
                      num_pages=64, max_pages_per_seq=8,
                      max_seq_len=256, lora_params={"x": bad})


def test_checkpoint_restore_validates_adapter(params, tmp_path):
    from aule_tpu.serving.engine import (
        load_engine_state,
        save_engine_state,
    )

    adapter = make_adapter(jax.random.key(10))
    eng = ServingEngine(params, CFG, max_batch=1, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, lora_params={"x": adapter})
    rng = np.random.default_rng(4)
    eng.submit(rng.integers(0, 256, size=6).astype(np.int32), 8,
               lora="x")
    eng.step()
    path = str(tmp_path / "ck")
    save_engine_state(eng, path)

    res = ServingEngine(params, CFG, max_batch=1, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256)  # no adapters registered
    with pytest.raises(ValueError, match="LoRA adapter"):
        load_engine_state(res, path)
