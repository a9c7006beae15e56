"""Per-token logprobs (submit(logprobs=True)).

Semantics pinned here: logprobs[i] = log softmax(raw target logits) at
output[i] — the model's own log-probability of the emitted token before
any temperature/top-k/top-p reshaping, identical across plain decode,
multi-step decode, and speculative rounds (all recompute the same
logits row).  Net-new vs the reference (no serving loop).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aule_tpu.models import llama
from aule_tpu.serving.engine import (
    ServingEngine,
    load_engine_state,
    save_engine_state,
)

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


def oracle_logprobs(params, prompt, output):
    """log softmax of the full-sequence forward at each emitted token."""
    seq = list(prompt)
    lps = []
    for tok in output:
        logits = llama.forward(
            params, jnp.asarray(np.asarray(seq)[None], jnp.int32), CFG)
        lsm = jax.nn.log_softmax(
            logits[0, len(seq) - 1].astype(jnp.float32))
        lps.append(float(lsm[tok]))
        seq.append(tok)
    return lps


def test_greedy_logprobs_match_oracle(params):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=7).astype(np.int32)
    eng = make_engine(params)
    eng.submit(prompt, max_new_tokens=6, logprobs=True)
    req = eng.run()[0]
    assert len(req.logprobs) == len(req.output) == 6
    want = oracle_logprobs(params, prompt, req.output)
    np.testing.assert_allclose(req.logprobs, want, rtol=0, atol=1e-4)


def test_logprobs_off_by_default(params):
    rng = np.random.default_rng(1)
    eng = make_engine(params)
    eng.submit(rng.integers(0, 256, size=5).astype(np.int32), 3)
    assert eng.run()[0].logprobs == []


def test_spec_logprobs_match_plain(params):
    """Speculative rounds report the same logprobs as plain decode —
    both read the target model's logits for the same positions."""
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 256, size=8).astype(np.int32)
    plain = make_engine(params)
    plain.submit(prompt, max_new_tokens=8, logprobs=True)
    want = plain.run()[0]

    draft_params = llama.init_params(DRAFT_CFG, jax.random.key(7))
    spec = make_engine(params, draft_params=draft_params,
                       draft_cfg=DRAFT_CFG, spec_tokens=3)
    spec.submit(prompt, max_new_tokens=8, logprobs=True)
    got = spec.run()[0]
    assert got.output == want.output
    np.testing.assert_allclose(got.logprobs, want.logprobs,
                               rtol=0, atol=1e-4)


def test_sampled_logprobs_finite(params):
    rng = np.random.default_rng(3)
    eng = make_engine(params)
    eng.submit(rng.integers(0, 256, size=6).astype(np.int32), 5,
               temperature=1.3, top_p=0.9, logprobs=True)
    req = eng.run()[0]
    lp = np.asarray(req.logprobs)
    assert lp.shape == (5,) and np.isfinite(lp).all() and (lp <= 0).all()


def test_logprobs_survive_checkpoint(params, tmp_path):
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 256, size=6).astype(np.int32)
    full = make_engine(params)
    full.submit(prompt, max_new_tokens=8, logprobs=True)
    want = full.run()[0]

    eng = make_engine(params)
    eng.submit(prompt, max_new_tokens=8, logprobs=True)
    eng.step(), eng.step(), eng.step()
    path = str(tmp_path / "ckpt")
    save_engine_state(eng, path)
    res = make_engine(params)
    load_engine_state(res, path)
    while res.has_work():
        res.step()
    got = res.finished[0]
    assert got.output == want.output
    np.testing.assert_allclose(got.logprobs, want.logprobs,
                               rtol=0, atol=1e-5)


def test_pool_logprobs_passthrough(params):
    from aule_tpu.serving.multihost import EngineReplicaPool

    rng = np.random.default_rng(5)
    pool = EngineReplicaPool([make_engine(params), make_engine(params)])
    gid = pool.submit(rng.integers(0, 256, size=6).astype(np.int32), 4,
                      logprobs=True)
    done = {r.req_id: r for r in pool.run()}
    assert len(done[gid].logprobs) == 4
