"""Llama model + serving engine tests (tiny config, CPU interpret mode).

Key property (tests/test_real_transformer.py analog): token-by-token paged
decode must reproduce the full-sequence flash-kernel forward exactly
(prefill/decode consistency), and training steps must reduce loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine
from aule_tpu.utils.testing import assert_close

CFG = llama.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.key(0))


def test_forward_shapes(params):
    tokens = jnp.asarray(np.arange(12, dtype=np.int32).reshape(1, 12) % 256)
    logits = llama.forward(params, tokens, CFG)
    assert logits.shape == (1, 12, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_decode_matches_forward(params):
    """Greedy generation via the serving engine == argmax over the
    full-sequence forward recomputed each step (the oracle decoder)."""
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=7).astype(np.int32)
    steps = 6

    # oracle: recompute full forward each step
    seq = list(prompt)
    oracle = []
    for _ in range(steps):
        logits = llama.forward(
            params, jnp.asarray(np.asarray(seq)[None], jnp.int32), CFG)
        nxt = int(jnp.argmax(logits[0, len(seq) - 1]))
        oracle.append(nxt)
        seq.append(nxt)

    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8, max_seq_len=256)
    eng.submit(prompt, max_new_tokens=steps)
    done = eng.run()
    assert len(done) == 1
    assert done[0].output == oracle, (done[0].output, oracle)


def test_engine_continuous_batching(params):
    """More requests than batch slots: all finish, outputs independent of
    co-scheduling (each request's output equals its solo-run output)."""
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (5, 9, 3, 12, 7)]

    solo_outputs = []
    for p in prompts:
        eng = ServingEngine(params, CFG, max_batch=1, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256)
        eng.submit(p, max_new_tokens=4)
        solo_outputs.append(eng.run()[0].output)

    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8, max_seq_len=256)
    for p in prompts:
        eng.submit(p, max_new_tokens=4)
    done = eng.run()
    assert len(done) == len(prompts)
    for req, want in zip(done, solo_outputs):
        assert req.output == want, f"req {req.req_id}: {req.output} != {want}"


def test_engine_page_reuse(params):
    """Pages freed by retired sequences get reused; pool never leaks."""
    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=16, max_pages_per_seq=4, max_seq_len=256)
    free0 = eng.allocator.num_free
    rng = np.random.default_rng(2)
    for _ in range(6):
        eng.submit(rng.integers(0, 256, size=6).astype(np.int32), 3)
    done = eng.run()
    assert len(done) == 6
    assert eng.allocator.num_free == free0


def test_train_step_reduces_loss(params):
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 32)), jnp.int32)
    p = params
    l0 = float(llama.loss_fn(p, tokens, CFG))
    for _ in range(3):
        p, loss = llama.train_step(p, tokens, CFG, lr=0.5)
    l1 = float(llama.loss_fn(p, tokens, CFG))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, (l0, l1)
