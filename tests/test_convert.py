"""HF checkpoint conversion equivalence: transformers (torch CPU) forward
vs aule-tpu model forward on converted weights."""

import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from aule_tpu.models import convert, gpt2, llama  # noqa: E402


def test_llama_conversion_matches_hf():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = llama.LlamaConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        hidden_dim=96, rope_base=10000.0, norm_eps=1e-5,
        dtype=jnp.float32)
    params = convert.llama_params_from_hf(hf, cfg)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, size=(2, 17))
    with torch.no_grad():
        want = hf(torch.asarray(tokens)).logits.float().numpy()
    got = np.asarray(llama.forward(
        params, jnp.asarray(tokens, jnp.int32), cfg))
    err = np.abs(got - want).max()
    assert err < 2e-3, f"llama conversion logits err {err}"


def test_gpt2_conversion_matches_hf():
    hf_cfg = transformers.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=2,
        layer_norm_epsilon=1e-5)
    torch.manual_seed(1)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()

    cfg = gpt2.GPT2Config(vocab_size=96, n_ctx=64, dim=64, n_layers=2,
                          n_heads=2, norm_eps=1e-5, dtype=jnp.float32)
    params = convert.gpt2_params_from_hf(hf, cfg)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 96, size=(2, 21))
    with torch.no_grad():
        want = hf(torch.asarray(tokens)).logits.float().numpy()
    got = np.asarray(gpt2.forward(
        params, jnp.asarray(tokens, jnp.int32), cfg))
    err = np.abs(got - want).max()
    assert err < 2e-3, f"gpt2 conversion logits err {err}"
