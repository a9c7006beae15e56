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


def test_engine_checkpoint_resume(tmp_path):
    """Save mid-generation, restore into a fresh engine, continue: outputs
    match the uninterrupted run exactly."""
    import numpy as np

    from aule_tpu.models import llama
    from aule_tpu.serving.engine import (
        ServingEngine,
        load_engine_state,
        save_engine_state,
    )

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (11, 6)]

    def make():
        return ServingEngine(params, cfg, max_batch=2, page_size=16,
                             num_pages=64, max_pages_per_seq=8,
                             max_seq_len=256, decode_steps=1)

    # uninterrupted reference
    eng = make()
    for p in prompts:
        eng.submit(p, max_new_tokens=8)
    want = [r.output for r in eng.run()]

    # interrupted: 3 steps, checkpoint, fresh engine, resume
    eng1 = make()
    for p in prompts:
        eng1.submit(p, max_new_tokens=8)
    for _ in range(3):
        eng1.step()
    save_engine_state(eng1, str(tmp_path / "ck"))

    eng2 = make()
    load_engine_state(eng2, str(tmp_path / "ck"))
    got = [r.output for r in eng2.run()]
    assert got == want, (got, want)


def test_engine_checkpoint_preserves_sampling_params(tmp_path):
    """Resume a mixed-sampling batch (greedy + temperature + top_k/p):
    token-identical to the uninterrupted run (the per-request
    temperature/top_k/top_p and the RNG key all round-trip)."""
    from aule_tpu.serving.engine import (
        ServingEngine,
        load_engine_state,
        save_engine_state,
    )

    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (9, 13, 7)]
    kws = [dict(temperature=0.0),
           dict(temperature=1.3),
           dict(temperature=0.9, top_k=5, top_p=0.9)]

    def make():
        return ServingEngine(params, cfg, max_batch=3, page_size=16,
                             num_pages=64, max_pages_per_seq=8,
                             max_seq_len=256, decode_steps=1,
                             sample_seed=3)

    eng = make()
    for p, kw in zip(prompts, kws):
        eng.submit(p, max_new_tokens=8, **kw)
    want = [r.output for r in eng.run()]

    eng1 = make()
    for p, kw in zip(prompts, kws):
        eng1.submit(p, max_new_tokens=8, **kw)
    for _ in range(3):
        eng1.step()
    save_engine_state(eng1, str(tmp_path / "ck"))

    eng2 = make()
    load_engine_state(eng2, str(tmp_path / "ck"))
    got = [r.output for r in eng2.run()]
    assert got == want, (got, want)


def test_ml_dtypes_round_trip_bit_exact(tmp_path):
    """bfloat16/float8 leaves survive the npz round trip bit-exactly
    (numpy would otherwise degrade them to void '|V2' records)."""
    import jax
    import jax.numpy as jnp

    from aule_tpu.utils.checkpoint import load_pytree, save_pytree

    rng = np.random.default_rng(0)
    tree = {
        "bf16": jnp.asarray(rng.standard_normal((4, 8)), jnp.bfloat16),
        "fp8": jnp.asarray(rng.standard_normal((4, 8)),
                           jnp.float8_e4m3fn),
        "f32": jnp.asarray(rng.standard_normal((3,)), jnp.float32),
        "i8": jnp.asarray(rng.integers(-5, 5, (2, 2)), jnp.int8),
    }
    path = str(tmp_path / "mlq")
    save_pytree(path, tree)
    out = load_pytree(path, tree)
    for k in tree:
        assert np.dtype(out[k].dtype) == np.dtype(tree[k].dtype), k
        np.testing.assert_array_equal(
            np.asarray(out[k]).view(np.uint8),
            np.asarray(tree[k]).view(np.uint8), err_msg=k)
    # jit accepts the restored leaves
    s = jax.jit(lambda t: t["bf16"].astype(jnp.float32).sum())(
        jax.tree.map(jnp.asarray, out))
    assert np.isfinite(float(s))


def test_legacy_void_checkpoint_rejected(tmp_path):
    """A pre-fix checkpoint whose bf16 leaves were degraded to void
    records fails loudly at load (not with a distant dtype error)."""
    import json

    import jax.numpy as jnp

    from aule_tpu.utils.checkpoint import (
        _tree_path,
        load_pytree,
        save_pytree,
    )

    del save_pytree  # the LEGACY writer is what we simulate
    tree = {"w": jnp.ones((2, 2), jnp.bfloat16)}
    path = str(tmp_path / "legacy")
    # pre-fix writer: np.savez degraded bf16 to a void record and the
    # sidecar carried no dtypes
    np.savez(path + ".npz", leaf_0=np.asarray(tree["w"]))
    with open(_tree_path(path), "w") as f:
        json.dump({"num_leaves": 1}, f)
    with pytest.raises(ValueError, match="legacy checkpoint"):
        load_pytree(path, tree)
