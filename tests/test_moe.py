"""MoE model family + expert parallelism (net-new; completes the
dp/tp/sp/pp/ep axis set)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from aule_tpu.models import moe
from aule_tpu.parallel.mesh import make_mesh
from aule_tpu.utils.testing import assert_close

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 (virtual) devices")

CFG = moe.MoEConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return moe.init_params(CFG, jax.random.key(0))


def _tokens(b, s, seed=0):
    return jnp.asarray(np.random.default_rng(seed).integers(
        0, CFG.vocab_size, (b, s)), jnp.int32)


def test_forward_runs_and_routes(params):
    logits = moe.forward(params, _tokens(2, 16), CFG)
    assert logits.shape == (2, 16, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_mlp_matches_manual_topk(params):
    """The dense mixture must equal a per-token manual top-k evaluation."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 6, CFG.dim)), jnp.float32)
    layer = params["layers"][0]
    got = np.asarray(moe._moe_mlp_dense(layer, x, CFG))[0]

    xt = np.asarray(x)[0]
    logits = xt @ np.asarray(layer["router"])
    for t in range(6):
        idx = np.argsort(logits[t])[::-1][:CFG.top_k]
        g = np.exp(logits[t][idx] - logits[t][idx].max())
        g = g / g.sum()
        want = np.zeros(CFG.dim, np.float32)
        for w, e in zip(g, idx):
            eg = np.asarray(layer["e_gate"][e])
            eu = np.asarray(layer["e_up"][e])
            ed = np.asarray(layer["e_down"][e])
            gate = xt[t] @ eg
            silu = gate / (1.0 + np.exp(-gate))
            want += w * ((silu * (xt[t] @ eu)) @ ed)
        assert_close(got[t], want, 1e-4, 1e-4, f"token {t}")


def test_expert_parallel_matches_dense(params):
    """EP over 4 expert shards == the dense single-device mixture
    (capacity large enough that nothing drops)."""
    mesh = make_mesh((4,), ("expert",), devices=jax.devices()[:4])
    tokens = _tokens(2, 16, seed=2)
    want = moe.forward(params, tokens, CFG)

    specs = moe.param_specs(CFG, expert_axis="expert", model_axis=None)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P))
    fn = make_fn = moe.make_expert_parallel_forward(
        mesh, CFG, capacity_factor=float(CFG.n_experts))  # no drops
    got = fn(placed, tokens)
    assert_close(np.asarray(got), np.asarray(want), 1e-4, 1e-4, "ep")


def test_capacity_drops_tokens(params):
    """With capacity_factor < 1 some tokens must drop (outputs change but
    stay finite) — GShard overflow semantics."""
    mesh = make_mesh((4,), ("expert",), devices=jax.devices()[:4])
    tokens = _tokens(2, 16, seed=3)
    tight = moe.make_expert_parallel_forward(mesh, CFG,
                                             capacity_factor=0.25)
    specs = moe.param_specs(CFG, expert_axis="expert", model_axis=None)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs, is_leaf=lambda x: isinstance(x, P))
    got = np.asarray(tight(placed, tokens))
    assert np.isfinite(got).all()


def test_train_step_decreases_loss(params):
    tokens = _tokens(4, 24, seed=4)
    p = params
    l0 = float(moe.loss_fn(p, tokens, CFG))
    for _ in range(3):
        p, loss = jax.jit(
            lambda p, t: moe.train_step(p, t, CFG, lr=5e-2))(p, tokens)
    assert float(loss) < l0, (float(loss), l0)


def test_aux_loss_balances(params):
    """The aux term is minimal (=1) under perfect balance, > 1 when the
    router collapses; check it is finite and >= 1-ish."""
    tokens = _tokens(2, 32, seed=5)
    _, aux = moe.forward(params, tokens, CFG, return_aux=True)
    assert np.isfinite(float(aux))
    assert float(aux) >= 0.9, float(aux)


def test_moe_engine_decode_matches_forward(params):
    """MoE served by the continuous-batching engine == full-forward
    argmax oracle (prefill + paged decode with the routed MLP)."""
    from aule_tpu.serving.engine import ServingEngine

    rng = np.random.default_rng(6)
    prompt = rng.integers(0, CFG.vocab_size, size=7).astype(np.int32)
    steps = 5

    seq = list(prompt)
    oracle = []
    for _ in range(steps):
        logits = moe.forward(
            params, jnp.asarray(np.asarray(seq)[None], jnp.int32), CFG)
        nxt = int(jnp.argmax(logits[0, len(seq) - 1]))
        oracle.append(nxt)
        seq.append(nxt)

    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, model=moe)
    eng.submit(prompt, max_new_tokens=steps)
    done = eng.run()
    assert len(done) == 1
    assert done[0].output == oracle, (done[0].output, oracle)


def test_moe_engine_quantized_runs(params):
    """int8-cache MoE serving completes; first token matches fp32."""
    from aule_tpu.serving.engine import ServingEngine

    rng = np.random.default_rng(7)
    prompt = rng.integers(0, CFG.vocab_size, size=9).astype(np.int32)
    outs = {}
    for quant in (False, True):
        eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, model=moe, quantized=quant)
        eng.submit(prompt, max_new_tokens=4)
        done = eng.run()
        outs[quant] = done[0].output
    assert outs[True][0] == outs[False][0]
