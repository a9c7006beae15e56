"""Prompt-lookup (n-gram) speculative decoding: draft-free speculation.

Candidates come from matching the context's trailing n-gram against
earlier context; the target verifies them in one chunked-prefill
dispatch (same machinery as draft-based spec).  Exactness bar is the
same: token-identical to plain greedy for ANY proposal quality.
"""

import numpy as np
import pytest

import jax

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine

CFG = llama.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.key(0))


def _run(params, prompts, max_new, **kw):
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, **kw)
    ids = [eng.submit(p, max_new_tokens=max_new) for p in prompts]
    done = {r.req_id: r for r in eng.run()}
    return [done[i].output for i in ids], eng


def test_ngram_matches_plain_greedy(params):
    """Repetitive prompts force lookup proposals; outputs must not move
    by a single token."""
    rng = np.random.default_rng(0)
    # wide-coverage prompt: the trailing (generated) token usually has
    # an earlier occurrence, so single-token-tail lookups fire; with
    # decode_steps=1 every host step tries the lookup first
    prompts = [rng.integers(0, 256, size=100).astype(np.int32),
               rng.integers(0, 256, size=9).astype(np.int32)]
    plain, _ = _run(params, prompts, 10)
    spec, eng = _run(params, prompts, 10, ngram_spec=3, decode_steps=1)
    assert spec == plain
    assert eng.spec_rounds > 0 and eng.spec_drafted > 0


def test_ngram_proposal_mechanics(params):
    eng = ServingEngine(params, CFG, max_batch=1, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, ngram_spec=3, ngram_max=3)
    # trailing [5, 6] matched at position 0 -> copy what followed
    seq = np.asarray([5, 6, 7, 8, 9, 5, 6], np.int32)
    np.testing.assert_array_equal(eng._ngram_propose(seq), [7, 8, 9])
    # most recent occurrence wins
    seq = np.asarray([5, 6, 1, 5, 6, 2, 3, 5, 6], np.int32)
    np.testing.assert_array_equal(eng._ngram_propose(seq), [2, 3, 5])
    # longest n wins over a shorter, more recent match
    seq = np.asarray([1, 2, 3, 9, 1, 2, 3], np.int32)
    np.testing.assert_array_equal(eng._ngram_propose(seq), [9, 1, 2])
    # a match whose continuation is cut off by the tail pads by
    # repeating its last token
    seq = np.asarray([4, 5, 6, 7, 7], np.int32)
    np.testing.assert_array_equal(eng._ngram_propose(seq), [7, 7, 7])
    # no match anywhere
    assert eng._ngram_propose(
        np.asarray([1, 2, 3, 4, 5], np.int32)) is None


def test_ngram_quantized_and_stop(params):
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, size=4).astype(np.int32)
    prompt = np.concatenate([base, base])
    plain, _ = _run(params, [prompt], 8, quantized=True)
    spec, _ = _run(params, [prompt], 8, quantized=True, ngram_spec=2)
    assert spec == plain

    stop = plain[0][2:4]
    eng = ServingEngine(params, CFG, max_batch=1, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, quantized=True, ngram_spec=2)
    eng.submit(prompt, max_new_tokens=8, stop=[stop])
    assert eng.run()[0].output == plain[0][:4]


def test_ngram_validation(params):
    kw = dict(max_batch=1, page_size=16, num_pages=64,
              max_pages_per_seq=8, max_seq_len=256)
    with pytest.raises(ValueError, match="mutually exclusive"):
        ServingEngine(params, CFG, ngram_spec=2, spec_tokens=2,
                      draft_params=params, draft_cfg=CFG, **kw)
    with pytest.raises(ValueError, match="fused"):
        ServingEngine(params, CFG, ngram_spec=2, layout="split", **kw)
    with pytest.raises(ValueError, match="greedy"):
        ServingEngine(params, CFG, ngram_spec=2,
                      sample=lambda lg: lg.argmax(-1), **kw)
