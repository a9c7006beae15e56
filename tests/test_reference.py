"""Layer-0 oracle tests: jnp reference vs pure-NumPy oracle + property tests.

Mirrors the reference's CPU test matrix (python/tests/test_cpu.py) and the
Zig property tests (tests/test_attention.zig:80-384): uniform weights ->
mean of V, identity K/V, batch independence, numerical stability at large
logits, fully-masked-row NaN safety.
"""

import jax.numpy as jnp
import os

import numpy as np
import pytest

from aule_tpu import flash_attention
from aule_tpu.ops.reference import (
    attention_reference,
    attention_reference_numpy,
    build_mask,
)
from aule_tpu.ops.rope import apply_rope, precompute_rope_frequencies
from aule_tpu.utils.testing import assert_close, random_qkv


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("head_dim", [32, 64, 128])
def test_xla_matches_numpy_oracle(causal, head_dim):
    q, k, v = random_qkv(2, 4, 128, head_dim)
    got = attention_reference(q, k, v, causal=causal)
    want = attention_reference_numpy(q, k, v, causal=causal)
    assert_close(got, want, 1e-5, 1e-5, f"causal={causal} D={head_dim}")


@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 2), (4, 1), (12, 2)])
def test_gqa_vs_expanded_kv(hq, hkv):
    """GQA must equal attention with KV heads repeated (test_gqa_unit.py analog)."""
    q, k, v = random_qkv(2, hq, 64, 64, heads_kv=hkv)
    got = attention_reference(q, k, v, causal=True)
    group = hq // hkv
    k_full = np.repeat(k, group, axis=1)
    v_full = np.repeat(v, group, axis=1)
    want = attention_reference_numpy(q, k_full, v_full, causal=True)
    assert_close(got, want, 1e-5, 1e-5, f"gqa {hq}:{hkv}")


def test_cross_attention():
    """Sq != Sk (reference tests/test_cross_attn.py)."""
    q, k, v = random_qkv(1, 4, 16, 64, seq_k=32)
    got = attention_reference(q, k, v)
    want = attention_reference_numpy(q, k, v)
    assert_close(got, want, 1e-5, 1e-5, "cross")


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("window", [16, 64, 127])
def test_sliding_window(causal, window):
    q, k, v = random_qkv(1, 2, 128, 32)
    got = attention_reference(q, k, v, causal=causal, window_size=window)
    want = attention_reference_numpy(
        q, k, v, causal=causal, window_size=window
    )
    assert_close(got, want, 1e-5, 1e-5, f"window={window} causal={causal}")


def test_window_mask_semantics():
    """Causal window allows k in [q-W, q]; bidirectional |q-k| <= W."""
    m = build_mask(8, 8, causal=True, window_size=2)
    assert m[5, 5] and m[5, 3] and not m[5, 2] and not m[5, 6]
    m2 = build_mask(8, 8, causal=False, window_size=2)
    assert m2[4, 6] and m2[4, 2] and not m2[4, 7] and not m2[4, 1]


def test_uniform_weights_give_mean_of_v():
    """Q=0 -> uniform softmax -> out = mean(V) (test_attention.zig property)."""
    _, k, v = random_qkv(1, 2, 64, 32)
    q = np.zeros((1, 2, 64, 32), np.float32)
    out = attention_reference(q, k, v)
    want = np.broadcast_to(v.mean(axis=2, keepdims=True), out.shape)
    assert_close(out, want, 1e-5, 1e-5, "uniform")


def test_batch_independence():
    q, k, v = random_qkv(2, 2, 32, 32)
    full = attention_reference(q, k, v, causal=True)
    solo = attention_reference(q[:1], k[:1], v[:1], causal=True)
    assert_close(full[:1], solo, 1e-6, 1e-6, "batch-independence")


def test_numerical_stability_large_logits():
    q, k, v = random_qkv(1, 1, 32, 32, scale=30.0)
    out = np.asarray(attention_reference(q, k, v))
    assert np.isfinite(out).all()
    want = attention_reference_numpy(q, k, v)
    assert_close(out, want, 1e-4, 1e-4, "large-logits")


def test_fully_masked_rows_are_zero_not_nan():
    """Window so small early rows see nothing -> 0 output (NaN-safety,
    triton_flash.py:201-220 semantics)."""
    q, k, v = random_qkv(1, 1, 8, 16)
    # q_offset shifts queries past all keys: every row fully masked
    out = np.asarray(
        attention_reference(q, k[:, :, :0], v[:, :, :0], causal=True)
        if False
        else attention_reference(q, k, v, causal=True, q_offset=-100)
    )
    assert np.isfinite(out).all()
    assert np.abs(out).max() == 0.0


def test_lse_matches_dense_logsumexp():
    q, k, v = random_qkv(1, 2, 64, 32)
    out, lse = attention_reference(q, k, v, causal=True, return_lse=True)
    scale = 1.0 / np.sqrt(32)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    mask = np.tril(np.ones((64, 64), bool))
    s = np.where(mask, s, -np.inf)
    want = np.log(np.sum(np.exp(s - s.max(-1, keepdims=True)), -1)) + s.max(-1)
    # compiled XLA transcendentals differ ~1e-5 from NumPy f64 on chip
    tol = 1e-4 if os.environ.get("AULE_TEST_TPU") == "1" else 1e-5
    assert_close(lse, want, tol, tol, "lse")


def test_rope_reference_rotation():
    """Half-split RoPE matches explicit rotation (test_rope_unit.py analog)."""
    cos, sin = precompute_rope_frequencies(16, 8)
    x = np.random.default_rng(0).standard_normal((1, 1, 16, 8)).astype(np.float32)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    cos_n, sin_n = np.asarray(cos), np.asarray(sin)
    want = np.empty_like(x)
    for pos in range(16):
        c, s = cos_n[pos], sin_n[pos]
        x1, x2 = x[..., pos, :4], x[..., pos, 4:]
        want[..., pos, :4] = x1 * c - x2 * s
        want[..., pos, 4:] = x1 * s + x2 * c
    assert_close(got, want, 1e-6, 1e-6, "rope")


def test_rope_position_zero_is_identity():
    cos, sin = precompute_rope_frequencies(4, 8)
    x = np.ones((1, 1, 1, 8), np.float32)
    got = apply_rope(jnp.asarray(x), cos, sin)
    assert_close(got, x, 1e-6, 1e-6, "rope-pos0")


def test_flash_attention_entrypoint_backends():
    q, k, v = random_qkv(1, 2, 64, 32)
    want = attention_reference_numpy(q, k, v, causal=True)
    for backend in ("xla", "numpy"):
        got = flash_attention(q, k, v, causal=True, backend=backend)
        assert_close(got, want, 1e-4, 1e-4, backend)


def test_validation_errors():
    q, k, v = random_qkv(1, 3, 16, 16, heads_kv=2)
    with pytest.raises(ValueError):
        flash_attention(q, k, v)
    with pytest.raises(ValueError):
        flash_attention(q[0], k[0], v[0])


def test_flash_attention_public_return_lse():
    """Public return_lse on all three backends agrees with the oracle."""
    import aule_tpu
    from aule_tpu.ops.reference import attention_reference_numpy
    from aule_tpu.utils.testing import assert_close, random_qkv

    q, k, v = random_qkv(1, 2, 128, 64)
    want_o, want_lse = attention_reference_numpy(
        q, k, v, causal=True, return_lse=True)
    for backend in ("pallas", "xla", "numpy"):
        o, lse = aule_tpu.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True,
            backend=backend, return_lse=True)
        assert_close(np.asarray(o), want_o, 1e-4, 1e-4, f"{backend} o")
        assert_close(np.asarray(lse), want_lse, 1e-4, 1e-4,
                     f"{backend} lse")
