"""Speculative decoding tests.

Net-new vs the reference (a single-device kernel library with no serving
loop at all — SURVEY.md §2.4); the correctness bar is absolute: greedy
speculative decoding must be TOKEN-IDENTICAL to plain greedy decode for
any draft model, because every emitted token is an argmax of the target
model's own logits (accepted drafts merely let one target dispatch
commit several of them).
"""

import numpy as np
import pytest

import jax

from aule_tpu.models import llama
from aule_tpu.serving.engine import (
    ServingEngine,
    load_engine_state,
    save_engine_state,
)

CFG = llama.LlamaConfig.tiny()
# a genuinely different (smaller + differently-initialized) draft
DRAFT_CFG = llama.LlamaConfig.tiny(dim=64, n_layers=1, n_heads=2,
                                   hidden_dim=128)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.key(0))


@pytest.fixture(scope="module")
def draft_params():
    return llama.init_params(DRAFT_CFG, jax.random.key(7))


def _run(params, prompts, max_new, **kw):
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, **kw)
    ids = [eng.submit(p, max_new_tokens=max_new) for p in prompts]
    done = {r.req_id: r for r in eng.run()}
    return [done[i].output for i in ids], eng


@pytest.mark.parametrize("spec_tokens", [1, 2, 4])
def test_spec_matches_plain_greedy(params, draft_params, spec_tokens):
    """A random (mostly-rejected) draft must not change a single token."""
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (7, 11)]
    plain, _ = _run(params, prompts, 8)
    spec, eng = _run(params, prompts, 8,
                     draft_params=draft_params, draft_cfg=DRAFT_CFG,
                     spec_tokens=spec_tokens)
    assert spec == plain
    assert eng.spec_drafted > 0
    assert 0 <= eng.spec_accepted <= eng.spec_drafted


def test_spec_perfect_draft_accepts_everything(params):
    """Draft == target: every candidate verifies, so each round commits
    K+1 tokens and the acceptance counter saturates."""
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 256, size=6).astype(np.int32)]
    plain, _ = _run(params, prompts, 9)
    spec, eng = _run(params, prompts, 9,
                     draft_params=params, draft_cfg=CFG, spec_tokens=2)
    assert spec == plain
    assert eng.spec_accepted == eng.spec_drafted


def test_spec_with_chunked_prefill(params, draft_params):
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 256, size=19).astype(np.int32)]
    plain, _ = _run(params, prompts, 6)
    spec, _ = _run(params, prompts, 6, prefill_chunk=8,
                   draft_params=draft_params, draft_cfg=DRAFT_CFG,
                   spec_tokens=3)
    assert spec == plain


@pytest.mark.slow
def test_spec_quantized(params, draft_params):
    """int8 pools: both paths quantize per-token rows, so spec decode
    stays token-identical to plain quantized decode."""
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 256, size=9).astype(np.int32)]
    plain, _ = _run(params, prompts, 7, quantized=True)
    spec, _ = _run(params, prompts, 7, quantized=True,
                   draft_params=draft_params, draft_cfg=DRAFT_CFG,
                   spec_tokens=2)
    assert spec == plain


@pytest.mark.slow
def test_spec_eos_mid_round(params, draft_params):
    """eos landing inside a speculative round truncates exactly where
    plain decode would stop (overshoot trimmed host-side)."""
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 256, size=5).astype(np.int32)
    plain, _ = _run(params, [prompt], 8)
    eos = plain[0][3]  # stop mid-stream
    want = plain[0][:4]
    got, _ = _run(params, [prompt], 8, draft_params=draft_params,
                  draft_cfg=DRAFT_CFG, spec_tokens=4)
    assert got[0] == plain[0]  # sanity: same stream without eos

    def run_eos(**kw):
        eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, **kw)
        eng.submit(prompt, max_new_tokens=8, eos_id=eos)
        return eng.run()[0].output

    assert run_eos() == want
    assert run_eos(draft_params=draft_params, draft_cfg=DRAFT_CFG,
                   spec_tokens=4) == want


@pytest.mark.slow
def test_spec_mixed_batch_keeps_speculating(params, draft_params):
    """A temperature-sampled request no longer suspends speculation for
    the batch (round-3 verdict: eligibility was all-or-nothing): the
    sampled slot rejection-samples inside the same verify dispatch while
    the greedy slot's tokens stay identical to its solo plain-greedy
    run."""
    rng = np.random.default_rng(5)
    greedy_prompt = rng.integers(0, 256, size=6).astype(np.int32)
    hot_prompt = rng.integers(0, 256, size=4).astype(np.int32)
    plain, _ = _run(params, [greedy_prompt], 14)

    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, draft_params=draft_params,
                        draft_cfg=DRAFT_CFG, spec_tokens=2)
    gid = eng.submit(greedy_prompt, max_new_tokens=14)
    hid = eng.submit(hot_prompt, max_new_tokens=4, temperature=0.8)
    done = {r.req_id: r for r in eng.run()}
    assert done[gid].output == plain[0]
    assert len(done[hid].output) == 4
    assert eng.spec_drafted > 0
    # both requests ran the whole time, so the mixed stretch speculated:
    # fewer decode dispatches than the 14 greedy tokens would need alone
    assert eng.spec_rounds >= 3


@pytest.mark.slow
def test_spec_checkpoint_roundtrip(params, draft_params, tmp_path):
    """Preempt mid-generation, restore into a fresh engine, finish:
    byte-identical to the uninterrupted run (draft pool + dlens travel
    with the checkpoint)."""
    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 256, size=8).astype(np.int32)
    kw = dict(max_batch=2, page_size=16, num_pages=64,
              max_pages_per_seq=8, max_seq_len=256,
              draft_params=draft_params, draft_cfg=DRAFT_CFG,
              spec_tokens=2)
    full = ServingEngine(params, CFG, **kw)
    full.submit(prompt, max_new_tokens=10)
    want = full.run()[0].output

    eng = ServingEngine(params, CFG, **kw)
    eng.submit(prompt, max_new_tokens=10)
    eng.step()  # prefill + first token
    eng.step()  # one spec round
    path = str(tmp_path / "ckpt")
    save_engine_state(eng, path)

    res = ServingEngine(params, CFG, **kw)
    load_engine_state(res, path)
    assert np.array_equal(res.slot_dlens, eng.slot_dlens)
    while res.has_work():
        res.step()
    assert res.finished[0].output == want


def test_spec_validation_errors(params, draft_params):
    kw = dict(max_batch=1, page_size=16, num_pages=64,
              max_pages_per_seq=8, max_seq_len=256)
    with pytest.raises(ValueError, match="draft_params"):
        ServingEngine(params, CFG, spec_tokens=2, **kw)
    with pytest.raises(ValueError, match="fused"):
        ServingEngine(params, CFG, spec_tokens=2, layout="split",
                      draft_params=draft_params, draft_cfg=DRAFT_CFG, **kw)
    with pytest.raises(ValueError, match="greedy"):
        ServingEngine(params, CFG, spec_tokens=2,
                      sample=lambda lg: lg.argmax(-1),
                      draft_params=draft_params, draft_cfg=DRAFT_CFG, **kw)
    bad_cfg = llama.LlamaConfig.tiny(vocab_size=CFG.vocab_size + 1,
                                     dim=64, n_layers=1, n_heads=2,
                                     hidden_dim=128)
    with pytest.raises(ValueError, match="vocab"):
        ServingEngine(params, CFG, spec_tokens=2,
                      draft_params=draft_params, draft_cfg=bad_cfg, **kw)


# ---------------------------------------------------------------------------
# cross-family: window (Mistral), GPT-2, MoE targets; mixed-family draft
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_spec_sliding_window_model(draft_params):
    """Mistral-style windowed target: the verify prefill's window mask
    and plain decode's trailing-window kernel must agree token-for-token
    once the context exceeds the window."""
    cfg = llama.LlamaConfig.tiny(window_size=24)
    params = llama.init_params(cfg, jax.random.key(2))
    rng = np.random.default_rng(8)
    prompt = rng.integers(0, 256, size=20).astype(np.int32)

    def run(**kw):
        eng = ServingEngine(params, cfg, max_batch=1, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, **kw)
        eng.submit(prompt, max_new_tokens=16)  # well past the window
        return eng.run()[0].output

    assert run(draft_params=draft_params, draft_cfg=DRAFT_CFG,
               spec_tokens=3) == run()


def test_spec_gpt2_family():
    from aule_tpu.models import gpt2

    cfg = gpt2.GPT2Config.tiny()
    dcfg = gpt2.GPT2Config.tiny(n_layers=1)
    params = gpt2.init_params(cfg, jax.random.key(3))
    dparams = gpt2.init_params(dcfg, jax.random.key(4))
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, cfg.vocab_size, size=7).astype(np.int32)

    def run(**kw):
        eng = ServingEngine(params, cfg, max_batch=1, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, model=gpt2, **kw)
        eng.submit(prompt, max_new_tokens=8)
        return eng.run()[0].output

    assert run(draft_params=dparams, draft_cfg=dcfg,
               spec_tokens=2) == run()


def test_spec_moe_target_llama_draft(draft_params):
    """Routed-MoE target verified against a dense Llama draft — the
    draft_model= knob crosses model families (shared tokenizer)."""
    from aule_tpu.models import moe

    cfg = moe.MoEConfig.tiny()
    params = moe.init_params(cfg, jax.random.key(5))
    rng = np.random.default_rng(10)
    prompt = rng.integers(0, cfg.vocab_size, size=6).astype(np.int32)

    def run(**kw):
        eng = ServingEngine(params, cfg, max_batch=1, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, model=moe, **kw)
        eng.submit(prompt, max_new_tokens=6)
        return eng.run()[0].output

    assert run(draft_params=draft_params, draft_cfg=DRAFT_CFG,
               draft_model=llama, spec_tokens=2) == run()


@pytest.mark.slow
def test_spec_with_prefix_cache(params, draft_params):
    """Prefix caching composes with spec decode: cached pages carry
    draft KV too (both pools share page ids, every spec-engine request
    populates both over its prompt), so a hit skips draft prefill as
    well and the tokens still match the plain engine's."""
    rng = np.random.default_rng(11)
    shared = rng.integers(0, 256, size=32).astype(np.int32)
    prompts = [np.concatenate([shared,
                               rng.integers(0, 256, size=5).astype(
                                   np.int32)]) for _ in range(2)]
    plain, _ = _run(params, prompts, 6, prefill_chunk=16,
                    enable_prefix_cache=True)
    spec, eng = _run(params, prompts, 6, prefill_chunk=16,
                     enable_prefix_cache=True,
                     draft_params=draft_params, draft_cfg=DRAFT_CFG,
                     spec_tokens=2)
    assert spec == plain
    assert eng.prefix_cache_hit_tokens >= 32  # 2 full shared pages


def test_spec_tensor_parallel(params, draft_params):
    """TP spec serving: draft params/pool shard over the model axis like
    the target's; tokens match the single-device spec engine."""
    from aule_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    rng = np.random.default_rng(12)
    prompts = [rng.integers(0, 256, size=9).astype(np.int32)]
    solo, _ = _run(params, prompts, 7)
    mesh = make_mesh((1, 2), ("data", "model"),
                     devices=jax.devices()[:2])
    tp, eng = _run(params, prompts, 7, mesh=mesh,
                   draft_params=draft_params, draft_cfg=DRAFT_CFG,
                   spec_tokens=2)
    assert tp == solo
    assert eng.spec_drafted > 0


@pytest.mark.slow
def test_spec_adaptive_disable(params, draft_params):
    """spec_min_acceptance: a draft whose measured acceptance stays
    below the threshold stops being consulted after 8 rounds (plain
    multi-step decode is faster then); tokens are identical regardless."""
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, 256, size=6).astype(np.int32)]
    plain, _ = _run(params, prompts, 24)
    spec, eng = _run(params, prompts, 24,
                     draft_params=draft_params, draft_cfg=DRAFT_CFG,
                     spec_tokens=1, spec_min_acceptance=0.99)
    assert spec == plain
    assert eng._spec_disabled
    assert eng.spec_rounds >= 8
    assert eng.stats()["spec_disabled"]

    # a perfect draft never trips the threshold
    spec, eng = _run(params, prompts, 24, draft_params=params,
                     draft_cfg=CFG, spec_tokens=1,
                     spec_min_acceptance=0.5)
    assert spec == plain and not eng._spec_disabled


# ---------------------------------------------------------------------------
# rejection-sampling speculation for temperature > 0 requests (round 4).
# Net-new vs the reference (no serving loop, SURVEY.md §2.4); the math is
# Leviathan et al. speculative sampling: accept draft g with probability
# min(1, p(g)/q(g)), resample rejects from norm((p-q)^+) — every emitted
# token is exactly target-distributed.
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_spec_sampled_topk1_matches_greedy(params, draft_params):
    """top_k=1 at any temperature is a degenerate one-hot distribution,
    so spec-sampled output must be TOKEN-IDENTICAL to plain greedy —
    a sharp end-to-end check of the warp plumbing (temperature scaling +
    top-k restriction on both the draft proposals and the target's
    accept/residual/bonus distributions)."""
    rng = np.random.default_rng(20)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (6, 9)]
    greedy, _ = _run(params, prompts, 10)
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, draft_params=draft_params,
                        draft_cfg=DRAFT_CFG, spec_tokens=2)
    ids = [eng.submit(p, max_new_tokens=10, temperature=5.0, top_k=1)
           for p in prompts]
    done = {r.req_id: r for r in eng.run()}
    assert [done[i].output for i in ids] == greedy
    assert eng.spec_rounds > 0


def test_spec_sampled_logit_bias_forces_token(params, draft_params):
    """A huge logit_bias pins the warped target distribution to one
    token; rejection sampling must emit it every time even though the
    draft (which never sees the bias) proposes other tokens — i.e. the
    residual resample draws from the BIASED warped distribution."""
    rng = np.random.default_rng(21)
    prompt = rng.integers(0, 256, size=5).astype(np.int32)
    eng = ServingEngine(params, CFG, max_batch=1, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, draft_params=draft_params,
                        draft_cfg=DRAFT_CFG, spec_tokens=3)
    eng.submit(prompt, max_new_tokens=8, temperature=1.0,
               logit_bias={7: 1e9})
    out = eng.run()[0].output
    assert out == [7] * 8
    assert eng.spec_rounds > 0


@pytest.mark.slow
def test_spec_per_slot_budget_caps(params, draft_params):
    """A request whose remaining budget can't take a full K+1 round
    participates with a 1-token verify instead of suspending speculation
    for the whole batch; the long greedy request still matches its solo
    plain-greedy stream and the short one completes exactly."""
    rng = np.random.default_rng(22)
    long_prompt = rng.integers(0, 256, size=6).astype(np.int32)
    short_prompt = rng.integers(0, 256, size=4).astype(np.int32)
    plain, _ = _run(params, [long_prompt], 12)
    plain_short, _ = _run(params, [short_prompt], 2)

    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, draft_params=draft_params,
                        draft_cfg=DRAFT_CFG, spec_tokens=4)
    lid = eng.submit(long_prompt, max_new_tokens=12)
    sid = eng.submit(short_prompt, max_new_tokens=2)  # < K+1 budget
    done = {r.req_id: r for r in eng.run()}
    assert done[lid].output == plain[0]
    assert done[sid].output == plain_short[0]
    assert eng.spec_rounds > 0


def test_spec_sampled_distribution_chi2():
    """Spec-sampled output distribution must match plain sampling: over
    a tiny vocab, many independent requests with the same prompt, the
    empirical distribution of the first spec-round token (output[1])
    under speculation is compared to plain decode's with a two-sample
    chi-squared homogeneity test.  Deterministic given the fixed seeds,
    so this either always passes or flags a real distribution bug."""
    cfg = llama.LlamaConfig.tiny(vocab_size=16, dim=64, n_layers=1,
                                 n_heads=2, hidden_dim=128)
    dcfg = llama.LlamaConfig.tiny(vocab_size=16, dim=32, n_layers=1,
                                  n_heads=2, hidden_dim=64)
    tparams = llama.init_params(cfg, jax.random.key(30))
    dparams = llama.init_params(dcfg, jax.random.key(31))
    prompt = np.asarray([3, 1, 4, 1], np.int32)
    n_req = 192

    def collect(**kw):
        eng = ServingEngine(tparams, cfg, max_batch=8, page_size=16,
                            num_pages=192, max_pages_per_seq=2,
                            max_seq_len=32, sample_seed=5, **kw)
        ids = [eng.submit(prompt, max_new_tokens=4, temperature=1.0)
               for _ in range(n_req)]
        done = {r.req_id: r for r in eng.run()}
        return np.asarray([done[i].output[1] for i in ids]), eng

    plain, _ = collect()
    spec, eng = collect(draft_params=dparams, draft_cfg=dcfg,
                        spec_tokens=2)
    assert eng.spec_rounds > 0 and eng.spec_accepted > 0
    n1 = np.bincount(plain, minlength=16).astype(np.float64)
    n2 = np.bincount(spec, minlength=16).astype(np.float64)
    pooled = (n1 + n2) / (n1.sum() + n2.sum())
    e1, e2 = pooled * n1.sum(), pooled * n2.sum()
    keep = pooled > 0
    chi2 = (((n1 - e1) ** 2 / np.maximum(e1, 1e-9))[keep].sum()
            + ((n2 - e2) ** 2 / np.maximum(e2, 1e-9))[keep].sum())
    dof = int(keep.sum()) - 1
    # p=0.001 critical value for dof<=15 is < 37.7; anything near that
    # on matched distributions would be a wild outlier
    assert chi2 < 37.7 + 2.0 * max(0, dof - 15), (chi2, dof, n1, n2)


@pytest.mark.tpu
def test_spec_chip_argmax_flip_rate_bounded(params):
    """Chip-suite regression gate for verify/decode kernel consistency
    (r4 observation, r5 verdict item 8): on hardware the verify's
    chunked-prefill kernel and the decode kernel reduce in different
    orders, so near-tie logits can argmax-flip between the speculative
    and plain greedy streams — 98.2% per-token greedy-prefix match was
    measured in r4.  This pins the floor: a kernel change that degrades
    consistency to <95% (or breaks the self-draft acceptance mechanics)
    fails loudly.  CPU-suite bitwise identity is pinned separately by
    test_spec_matches_plain_greedy (exact arithmetic)."""
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (7, 11)]
    plain, _ = _run(params, prompts, 16)
    spec, eng = _run(params, prompts, 16,
                     draft_params=params, draft_cfg=CFG, spec_tokens=2)
    same = total = 0
    for g, w in zip(spec, plain):
        for a, b in zip(g, w):
            total += 1
            if a != b:
                break
            same += 1
    match = same / max(total, 1)
    assert match >= 0.95, f"greedy-prefix match {match:.1%} < 95%"
    # self-draft acceptance: every proposal is the target's own argmax,
    # so only tie-flips reject — acceptance must stay high
    acc = eng.spec_accepted / max(eng.spec_drafted, 1)
    assert acc >= 0.85, f"self-draft acceptance {acc:.1%} < 85%"


@pytest.mark.slow
def test_spec_sampled_reproducible(params, draft_params):
    """Same sample_seed + same submission order => identical sampled
    streams across engines (the verify's accept/resample draws chain
    from the engine RNG like plain decode's)."""
    rng = np.random.default_rng(23)
    prompt = rng.integers(0, 256, size=6).astype(np.int32)

    def run_once():
        eng = ServingEngine(params, CFG, max_batch=1, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, sample_seed=9,
                            draft_params=draft_params,
                            draft_cfg=DRAFT_CFG, spec_tokens=2)
        eng.submit(prompt, max_new_tokens=8, temperature=0.9)
        return eng.run()[0].output

    assert run_once() == run_once()
