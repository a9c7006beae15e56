"""Per-request logit_bias (OpenAI-style {token_id: additive bias}).

Applied to the logits before argmax/sampling on every path — prefill
first token, plain decode, multi-step decode, and both speculative
verifies — while reported logprobs stay raw-model.
"""

import numpy as np
import pytest

import jax

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine

CFG = llama.LlamaConfig.tiny()
DRAFT_CFG = llama.LlamaConfig.tiny(dim=64, n_layers=1, n_heads=2,
                                   hidden_dim=128)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.key(0))


def run(params, prompt, max_new=6, **kw):
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, **kw.pop("engine_kw", {}))
    eng.submit(prompt, max_new_tokens=max_new, **kw)
    return eng.run()[0]


def test_ban_and_force(params):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=7).astype(np.int32)
    plain = run(params, prompt).output
    # banning every token the plain run produced changes all of them
    ban = {t: -1e9 for t in set(plain)}
    banned = run(params, prompt, logit_bias=ban).output
    assert all(t not in ban for t in banned)
    # forcing one token makes the whole stream that token
    forced = run(params, prompt, logit_bias={42: 1e9}).output
    assert forced == [42] * 6


def test_bias_applies_in_spec_rounds(params):
    """Both spec modes pick the BIASED argmax, so a biased greedy
    request decodes identically with and without speculation."""
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 256, size=7).astype(np.int32)
    plainish = run(params, prompt).output
    bias = {int(plainish[1]): -1e9}
    want = run(params, prompt, logit_bias=bias).output
    assert want != plainish

    draft_params = llama.init_params(DRAFT_CFG, jax.random.key(7))
    got = run(params, prompt, logit_bias=bias,
              engine_kw=dict(draft_params=draft_params,
                             draft_cfg=DRAFT_CFG, spec_tokens=3)).output
    assert got == want
    got = run(params, prompt, logit_bias=bias,
              engine_kw=dict(ngram_spec=2, decode_steps=1)).output
    assert got == want


def test_unbiased_rows_unaffected_and_logprobs_raw(params):
    rng = np.random.default_rng(2)
    p1 = rng.integers(0, 256, size=6).astype(np.int32)
    p2 = rng.integers(0, 256, size=9).astype(np.int32)
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256)
    solo = run(params, p2, max_new=4).output

    r1 = eng.submit(p1, max_new_tokens=4, logit_bias={42: 1e9},
                    logprobs=True)
    r2 = eng.submit(p2, max_new_tokens=4)
    done = {r.req_id: r for r in eng.run()}
    assert done[r2].output == solo          # co-batched row untouched
    assert done[r1].output == [42] * 4
    # logprobs report the RAW model probability of the forced token
    assert all(lp < -1.0 for lp in done[r1].logprobs)


def test_bias_validation(params):
    eng = ServingEngine(params, CFG, max_batch=1, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256)
    with pytest.raises(ValueError, match="token ids"):
        eng.submit(np.asarray([1, 2], np.int32), 4,
                   logit_bias={9999: 1.0})
