"""Request cancellation (client disconnect / abort).

Net-new vs the reference (no serving loop at all).  Cancelling must free
the request's pages for waiting work, preserve co-scheduled requests'
outputs bit-for-bit, and be safe when invoked from inside a streaming
on_token callback (mid multi-step-decode or mid speculative round).
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


def make_engine(params, **kw):
    return ServingEngine(params, CFG, max_batch=2, page_size=16,
                         num_pages=64, max_pages_per_seq=8,
                         max_seq_len=256, **kw)


def test_cancel_waiting_request(params):
    eng = make_engine(params)
    rng = np.random.default_rng(0)
    keep = eng.submit(rng.integers(0, 256, size=6).astype(np.int32), 4)
    # fill both slots so the third stays waiting
    eng.submit(rng.integers(0, 256, size=6).astype(np.int32), 4)
    victim = eng.submit(rng.integers(0, 256, size=6).astype(np.int32), 4)
    eng.step()  # admits the first two
    assert eng.cancel(victim)
    done = {r.req_id: r for r in eng.run()}
    assert done[victim].cancelled and done[victim].output == []
    assert not done[keep].cancelled and len(done[keep].output) == 4


def test_cancel_running_frees_pages_for_waiting(params):
    """A cancelled running request's pages admit the queued one, and the
    survivor's tokens match its solo run."""
    rng = np.random.default_rng(1)
    p_short = rng.integers(0, 256, size=5).astype(np.int32)
    solo = make_engine(params)
    solo.submit(p_short, max_new_tokens=4)
    want = solo.run()[0].output

    # tiny pool: two big requests exhaust it; the third must wait
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=9, max_pages_per_seq=4,
                        max_seq_len=256)
    big = rng.integers(0, 256, size=40).astype(np.int32)
    v1 = eng.submit(big, max_new_tokens=24)       # 4 pages
    v2 = eng.submit(big, max_new_tokens=24)       # 4 pages (pool full)
    kid = eng.submit(p_short, max_new_tokens=4)   # waits
    eng.step()
    assert eng.num_running == 2 and eng.waiting
    assert eng.cancel(v1) and eng.cancel(v2)
    done = {r.req_id: r for r in eng.run()}
    assert done[v1].cancelled and done[v2].cancelled
    assert done[kid].output == want
    assert eng.allocator.num_free == 9 - 1  # all pages back (1 scratch)


def test_cancel_from_on_token_mid_decode(params):
    """cancel() invoked from the streaming callback — mid multi-step
    decode — stops emission immediately and retires cleanly."""
    rng = np.random.default_rng(2)
    eng = make_engine(params, decode_steps=4)
    seen = []

    def cb(rid, tok):
        seen.append(tok)
        if len(seen) == 3:
            assert eng.cancel(rid)

    rid = eng.submit(rng.integers(0, 256, size=6).astype(np.int32), 16,
                     on_token=cb)
    done = eng.run()
    assert done[0].req_id == rid and done[0].cancelled
    assert len(done[0].output) == 3 == len(seen)
    assert eng.allocator.num_free == 64 - 1


@pytest.mark.slow
def test_cancel_from_on_token_mid_spec_round(params):
    rng = np.random.default_rng(3)
    draft_params = llama.init_params(DRAFT_CFG, jax.random.key(7))
    eng = make_engine(params, draft_params=params, draft_cfg=CFG,
                      spec_tokens=3)
    del draft_params
    seen = []

    def cb(rid, tok):
        seen.append(tok)
        if len(seen) == 4:  # inside a K=3 round (emits up to 4/round)
            assert eng.cancel(rid)

    rid = eng.submit(rng.integers(0, 256, size=6).astype(np.int32), 16,
                     on_token=cb)
    done = eng.run()
    assert done[0].cancelled and len(done[0].output) == 4
    assert eng.allocator.num_free == 64 - 1


def test_cancel_unknown_or_finished(params):
    rng = np.random.default_rng(4)
    eng = make_engine(params)
    rid = eng.submit(rng.integers(0, 256, size=5).astype(np.int32), 2)
    assert not eng.cancel(rid + 999)
    eng.run()
    assert not eng.cancel(rid)  # already finished


def test_cancel_on_first_token_with_prefix_cache(params):
    """cancel() from the on_token callback on the PREFILL-emitted first
    token, with prefix caching on: the engine must not register pages of
    the already-retired slot (code-review r3 finding: IndexError)."""
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 256, size=20).astype(np.int32)  # >1 page
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, prefill_chunk=8,
                        enable_prefix_cache=True)

    def cb(rid, tok):
        assert eng.cancel(rid)

    rid = eng.submit(prompt, max_new_tokens=6, on_token=cb)
    done = eng.run()
    assert done[0].req_id == rid and done[0].cancelled
    assert len(done[0].output) == 1
    assert eng.allocator.num_free == 64 - 1
