"""GPT-2 model family: forward/decode parity, engine integration, D=64
pool padding end-to-end (the reference's integration target is GPT-2,
python/aule/patching.py:15-128)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aule_tpu.models import gpt2
from aule_tpu.serving.engine import ServingEngine

CFG = gpt2.GPT2Config.tiny()   # head_dim = 64 -> exercises pool padding


@pytest.fixture(scope="module")
def params():
    return gpt2.init_params(CFG, jax.random.key(0))


def test_forward_vs_oracle(params):
    """flash-kernel forward == naive masked-softmax attention forward.

    Matmuls are pinned to "highest" precision so the TPU MXU runs full
    f32 passes in BOTH paths; without the pin the default bf16-pass f32
    einsums diverge beyond any meaningful tolerance across a 2-layer
    model + vocab projection (r3 chip campaign).  A residual chip
    tolerance covers the pallas kernel's own accumulation order.
    """
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 24)), jnp.int32)

    def naive(params, tokens):
        b, s = tokens.shape
        pos = jnp.arange(s)[None]
        x = params["wte"][tokens] + params["wpe"][pos]
        for layer in params["layers"]:
            h = gpt2.layer_norm(x, layer["ln1_g"], layer["ln1_b"],
                                CFG.norm_eps)
            q, k, v = gpt2._qkv(layer, h, CFG)
            sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(CFG.head_dim)
            mask = jnp.tril(jnp.ones((s, s), bool))
            sc = jnp.where(mask, sc, -1e30)
            attn = jnp.einsum("bhqk,bhkd->bhqd",
                              jax.nn.softmax(sc, axis=-1), v)
            x = x + gpt2._merge(attn) @ layer["w_proj"]
            x = gpt2._mlp(layer, x, CFG)
        x = gpt2.layer_norm(x, params["final_ln_g"], params["final_ln_b"],
                            CFG.norm_eps)
        return (x @ params["wte"].T).astype(jnp.float32)

    with jax.default_matmul_precision("highest"):
        logits = gpt2.forward(params, tokens, CFG)
        want = naive(params, tokens)
    tol = 2e-3 if os.environ.get("AULE_TEST_TPU") == "1" else 2e-4
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=tol, atol=tol)


def test_engine_gpt2_decode_matches_forward(params):
    """Greedy generation through the engine == full-forward oracle."""
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 256, size=9).astype(np.int32)
    steps = 5

    seq = list(prompt)
    oracle = []
    for _ in range(steps):
        logits = gpt2.forward(
            params, jnp.asarray(np.asarray(seq)[None], jnp.int32), CFG)
        nxt = int(jnp.argmax(logits[0, len(seq) - 1]))
        oracle.append(nxt)
        seq.append(nxt)

    eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8,
                        max_seq_len=256, model=gpt2)
    eng.submit(prompt, max_new_tokens=steps)
    done = eng.run()
    assert done[0].output == oracle, (done[0].output, oracle)


@pytest.mark.parametrize("quant", [False, True])
def test_engine_gpt2_chunked_prefill(params, quant):
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (19, 33)]
    outs = {}
    for chunk in (None, 8):
        eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, model=gpt2, quantized=quant,
                            prefill_chunk=chunk)
        for p in prompts:
            eng.submit(p, max_new_tokens=4)
        outs[chunk] = [r.output for r in eng.run()]
    assert outs[None] == outs[8], (outs[None], outs[8])


def test_engine_rejects_seq_beyond_n_ctx(params):
    """Learned positions clamp silently past n_ctx under JAX gather
    semantics — the engine must refuse max_seq_len > n_ctx (ADVICE r1)."""
    with pytest.raises(ValueError, match="n_ctx"):
        ServingEngine(params, CFG, max_batch=2, page_size=16,
                      num_pages=64, max_pages_per_seq=32,
                      max_seq_len=CFG.n_ctx + 64, model=gpt2)


def test_gpt2_forward_tensor_parallel(params):
    """forward(mesh=) — MHA heads sharded over `model` (the qkv-major
    [3, dim, H*Dh] w_qkv layout head-shards under param_specs) — matches
    the single-device forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aule_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh((2, 2), ("data", "model"),
                     devices=jax.devices()[:4])
    sharded = jax.device_put(
        params, jax.tree.map(
            lambda s: NamedSharding(mesh, s), gpt2.param_specs(CFG),
            is_leaf=lambda x: isinstance(x, P)))
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, 256, size=(2, 24)), jnp.int32)
    want = gpt2.forward(params, tokens, CFG)
    got = gpt2.forward(sharded, tokens, CFG, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_engine_gpt2_tensor_parallel_fused(params, quant):
    """TP serving for the GPT-2 family on the fused fast path: mesh
    engine generates the same tokens as the single-device engine
    (removes r2's NotImplementedError, VERDICT §2.1 HF-patching row)."""
    from aule_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (7, 13)]
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    outs = {}
    for mesh in (None, make_mesh((1, 2), ("data", "model"),
                                 devices=jax.devices()[:2])):
        eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, model=gpt2, layout="fused",
                            mesh=mesh, quantized=quant)
        for p in prompts:
            eng.submit(p, max_new_tokens=5)
        outs[mesh is None] = [r.output for r in eng.run()]
    assert outs[True] == outs[False], (outs[True], outs[False])
