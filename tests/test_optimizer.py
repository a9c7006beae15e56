"""ZeRO-1 AdamW tests (8-device virtual CPU mesh).

The sharded step must be numerically the plain single-device AdamW step
(ZeRO-1 is a memory layout, not an algorithm change), with the moments
actually partitioned over the data axis.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from aule_tpu.models import llama
from aule_tpu.parallel.mesh import make_mesh
from aule_tpu.parallel.optimizer import (
    AdamWState,
    adamw_init,
    make_adamw_train_step,
    zero1_specs,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

CFG = llama.LlamaConfig.tiny(n_heads=4, n_kv_heads=2, dim=128,
                             hidden_dim=256, n_layers=2)


def _tokens(batch=4, seq=32):
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.integers(0, CFG.vocab_size, (batch, seq)), jnp.int32)


def test_adamw_loss_decreases_single_device():
    params = llama.init_params(CFG, jax.random.key(0))
    opt = adamw_init(params)
    step = make_adamw_train_step(llama, CFG, lr=3e-3)
    toks = _tokens()
    losses = []
    for _ in range(5):
        params, opt, loss = step(params, opt, toks)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(opt.count) == 5


def test_zero1_matches_single_device():
    """dp4 x tp2 ZeRO-1 step == plain AdamW, and the moments shard over
    the data axis while params stay data-replicated."""
    params0 = llama.init_params(CFG, jax.random.key(1))
    toks = _tokens()

    # reference: single device
    p_ref = jax.tree.map(lambda x: x, params0)
    opt_ref = adamw_init(p_ref)
    step_ref = make_adamw_train_step(llama, CFG, lr=1e-3,
                                     weight_decay=0.01)
    for _ in range(3):
        p_ref, opt_ref, loss_ref = step_ref(p_ref, opt_ref, toks)

    # sharded: dp4 x tp2
    mesh = make_mesh((4, 2), ("data", "model"))
    specs = llama.param_specs(CFG)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params0, specs, is_leaf=lambda x: isinstance(x, P))
    opt = adamw_init(params, specs, mesh)
    step = make_adamw_train_step(llama, CFG, mesh, lr=1e-3,
                                 weight_decay=0.01)
    for _ in range(3):
        params, opt, loss = step(params, opt, toks)

    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)
    flat_ref = jax.tree.leaves(p_ref)
    flat = jax.tree.leaves(params)
    for a, b in zip(flat, flat_ref):
        # sharded-reduction accumulation order wiggles the last ulps
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2e-4)
    # ZeRO-1: at least the big moments carry a 'data' partition
    mu_specs = [s.spec for s in jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding, opt.mu))]
    assert any("data" in tuple(s) for s in mu_specs)
    # params remain replicated over data (their specs never name it)
    p_shard = [s.spec for s in jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding, params))]
    assert all("data" not in tuple(s) for s in p_shard)


def test_zero1_specs_divisibility():
    mesh = make_mesh((4, 2), ("data", "model"))
    params = {"a": jnp.zeros((8, 6)), "b": jnp.zeros((3, 5)),
              "c": jnp.zeros((6, 8))}
    specs = {"a": P(None, "model"), "b": P(), "c": P("model", None)}
    zs = zero1_specs(specs, params, mesh)
    assert zs["a"] == P("data", "model")   # dim0 8 % 4 == 0
    assert zs["b"] == P(None, None)        # nothing divisible: replicated
    assert zs["c"] == P("model", "data")   # dim0 taken; dim1 8 % 4 == 0


def test_grad_accumulation_matches_full_batch():
    """micro_batches=N: same update as the full-batch step (the loss is
    a mean, so averaged microbatch grads == full-batch grads)."""
    params0 = llama.init_params(CFG, jax.random.key(2))
    toks = _tokens(batch=4)

    full_p, full_o = params0, adamw_init(params0)
    step_full = make_adamw_train_step(llama, CFG, lr=1e-3)
    full_p, full_o, full_loss = step_full(full_p, full_o, toks)

    acc_p, acc_o = params0, adamw_init(params0)
    step_acc = make_adamw_train_step(llama, CFG, lr=1e-3,
                                     micro_batches=4)
    acc_p, acc_o, acc_loss = step_acc(acc_p, acc_o, toks)

    np.testing.assert_allclose(float(acc_loss), float(full_loss),
                               atol=1e-6)
    for a, b in zip(jax.tree.leaves(acc_p), jax.tree.leaves(full_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)


def test_clip_and_schedule():
    """Global-norm clipping bounds the update; a warmup schedule's step
    size grows with count."""
    from aule_tpu.parallel.optimizer import global_norm

    params = llama.init_params(CFG, jax.random.key(3))
    toks = _tokens(batch=2)
    sched = lambda t: 1e-2 * jnp.minimum(1.0, t.astype(jnp.float32) / 4)
    step = make_adamw_train_step(llama, CFG, lr=sched, clip_norm=1e-3)
    opt = adamw_init(params)
    p1, opt, _ = step(params, opt, toks)
    d1 = global_norm(jax.tree.map(
        lambda a, b: a.astype(jnp.float32) - b.astype(jnp.float32),
        p1, params))
    p2, opt, _ = step(p1, opt, toks)
    d2 = global_norm(jax.tree.map(
        lambda a, b: a.astype(jnp.float32) - b.astype(jnp.float32),
        p2, p1))
    # warmup: step 2 moves further than step 1 (lr 1/4 -> 2/4 of peak)
    assert float(d2) > float(d1) * 1.5
    assert np.isfinite(float(d1)) and float(d1) > 0


@pytest.mark.slow
def test_master_weights_beat_bf16_updates():
    """bf16 params with an f32 master: tiny (sub-bf16-lsb) updates
    accumulate in the master instead of vanishing, and the sharded
    master matches the single-device master run."""
    bf_cfg = llama.LlamaConfig.tiny(n_heads=4, n_kv_heads=2, dim=128,
                                    hidden_dim=256, n_layers=2,
                                    dtype=jnp.bfloat16)
    params0 = llama.init_params(bf_cfg, jax.random.key(4))
    toks = _tokens()
    lr = 1e-6  # far below the bf16 ulp of O(1) weights

    p_plain, o_plain = params0, adamw_init(params0)
    step_plain = make_adamw_train_step(llama, bf_cfg, lr=lr)
    p_master, o_master = params0, adamw_init(params0,
                                             master_weights=True)
    step_master = make_adamw_train_step(llama, bf_cfg, lr=lr)
    for _ in range(8):
        p_plain, o_plain, _ = step_plain(p_plain, o_plain, toks)
        p_master, o_master, _ = step_master(p_master, o_master, toks)

    def drift(a, b):
        return float(global_norm(jax.tree.map(
            lambda x, y: x.astype(jnp.float32) - y.astype(jnp.float32),
            a, b)))

    from aule_tpu.parallel.optimizer import global_norm
    # the master moved even though bf16 params may round-trip; its
    # accumulated drift exceeds what the bf16-only path retained
    assert drift(o_master.master, jax.tree.map(
        lambda p: p.astype(jnp.float32), params0)) > 0.0
    # sharded master run == single-device master run
    mesh = make_mesh((4, 2), ("data", "model"))
    specs = llama.param_specs(bf_cfg)
    from jax.sharding import NamedSharding
    ps = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params0, specs, is_leaf=lambda x: isinstance(x, P))
    opt = adamw_init(ps, specs, mesh, master_weights=True)
    step = make_adamw_train_step(llama, bf_cfg, mesh, lr=lr)
    for _ in range(8):
        ps, opt, _ = step(ps, opt, toks)
    m_specs = [tuple(x.sharding.spec) for x in
               jax.tree.leaves(opt.master)]
    assert any("data" in s for s in m_specs)
    for a, b in zip(jax.tree.leaves(opt.master),
                    jax.tree.leaves(o_master.master)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)
