"""Checkpoint save/restore round trips (params + engine cache state)."""

import jax
import numpy as np
import pytest

from aule_tpu.models import llama
from aule_tpu.utils.checkpoint import load_pytree, save_pytree


def test_params_roundtrip(tmp_path):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    path = str(tmp_path / "ckpt")
    save_pytree(path, params)
    template = jax.tree.map(lambda x: None, params,
                            is_leaf=lambda x: not isinstance(x, (dict, list)))
    restored = load_pytree(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_leaf_count_mismatch_raises(tmp_path):
    path = str(tmp_path / "ckpt")
    save_pytree(path, {"a": np.zeros(3)})
    with pytest.raises(ValueError):
        load_pytree(path, {"a": np.zeros(3), "b": np.zeros(2)})
