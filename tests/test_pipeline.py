"""Pipeline parallelism over the virtual 8-device mesh: logits and a
training step through the GPipe schedule must match the plain model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from aule_tpu.models import llama
from aule_tpu.parallel.mesh import make_mesh
from aule_tpu.parallel.pipeline import (
    make_pipeline_forward,
    make_pipeline_train_step,
    pipeline_param_specs,
    stack_layer_params,
    unstack_layer_params,
)
from aule_tpu.utils.testing import assert_close

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

CFG = llama.LlamaConfig.tiny(n_layers=4)


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.key(0))


def _place(stacked, mesh):
    specs = pipeline_param_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        stacked, specs, is_leaf=lambda x: isinstance(x, P))


def test_stack_roundtrip(params):
    st = stack_layer_params(params)
    back = unstack_layer_params(st)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, back)


@pytest.mark.parametrize("microbatches", [2, 4])
def test_pipeline_forward_matches_plain(params, microbatches):
    mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, CFG.vocab_size, (4, 24)),
        jnp.int32)
    fwd = make_pipeline_forward(mesh, CFG, microbatches=microbatches)
    got = fwd(_place(stack_layer_params(params), mesh), tokens)
    want = llama.forward(params, tokens, CFG)
    assert_close(np.asarray(got), np.asarray(want), 2e-4, 2e-4,
                 f"pp forward mb={microbatches}")


def test_pipeline_train_step_matches_plain(params):
    """One pp SGD step == one plain SGD step (same loss, same updated
    params) — jax.grad really runs the reverse pipeline."""
    mesh = make_mesh((4,), ("pipe",), devices=jax.devices()[:4])
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, CFG.vocab_size, (4, 17)),
        jnp.int32)

    step = make_pipeline_train_step(mesh, CFG, microbatches=2, lr=1e-2)
    new_st, loss_pp = step(_place(stack_layer_params(params), mesh),
                           tokens)

    new_plain, loss_plain = llama.train_step(params, tokens, CFG, lr=1e-2)
    assert abs(float(loss_pp) - float(loss_plain)) < 1e-5, \
        (float(loss_pp), float(loss_plain))
    back = unstack_layer_params(jax.device_get(new_st))
    jax.tree.map(
        lambda a, b: assert_close(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32),
                                  1e-4, 1e-4, "pp params"),
        back, new_plain)
