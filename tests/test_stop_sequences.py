"""Multi-token stop sequences (submit(stop=[[...], ...])).

Generation ends the moment the output's tail equals any stop sequence
(stop tokens stay in the output, like eos); exact across plain decode,
multi-step decode, and speculative rounds because every path trims
host-side on Request.done.
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


def run(params, prompt, **kw):
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, **kw.pop("engine_kw", {}))
    eng.submit(prompt, max_new_tokens=10, **kw)
    return eng.run()[0].output


@pytest.mark.slow
def test_stop_sequence_truncates(params):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=6).astype(np.int32)
    plain = run(params, prompt)
    stop = plain[2:4]  # two-token stop landing mid-stream
    got = run(params, prompt, stop=[stop])
    assert got == plain[:4]
    # a sequence that never appears leaves the stream untouched
    assert run(params, prompt, stop=[[9999, 9999]]) == plain


def test_stop_sequence_in_spec_round(params):
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 256, size=6).astype(np.int32)
    plain = run(params, prompt)
    stop = plain[3:5]
    got = run(params, prompt, stop=[stop],
              engine_kw=dict(draft_params=params, draft_cfg=CFG,
                             spec_tokens=3))
    assert got == plain[:5]


def test_multiple_stops_first_wins(params):
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 256, size=5).astype(np.int32)
    plain = run(params, prompt)
    got = run(params, prompt, stop=[plain[6:8], [plain[2]]])
    assert got == plain[:3]  # the single-token stop fires first


def test_empty_stop_rejected(params):
    eng = ServingEngine(params, CFG, max_batch=1, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256)
    with pytest.raises(ValueError, match="non-empty"):
        eng.submit(np.asarray([1, 2], np.int32), 4, stop=[[]])


def test_first_token_satisfies_request(params):
    """max_new_tokens=1, a first-token eos, and a first-token stop all
    retire at the prefill-emitted token — no decode dispatch may extend
    them (code-review r3 finding: done was only checked on decode
    emits)."""
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 256, size=6).astype(np.int32)
    plain = run(params, prompt)
    first = plain[0]

    def run1(**kw):
        eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256)
        eng.submit(prompt, **kw)
        return eng.run()[0].output

    assert run1(max_new_tokens=1) == [first]
    assert run1(max_new_tokens=8, eos_id=first) == [first]
    assert run1(max_new_tokens=8, stop=[[first]]) == [first]
