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


def test_llama_hf_generate_equivalence_through_engine():
    """End-to-end: a converted HF Llama checkpoint served by the
    continuous-batching engine produces the SAME greedy tokens as
    transformers' own generate() — prefill, paged decode, KV append and
    sampling all agree with the HF reference implementation."""
    from aule_tpu.serving.engine import ServingEngine

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(3)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = llama.LlamaConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        hidden_dim=96, rope_base=10000.0, norm_eps=1e-5,
        dtype=jnp.float32)
    params = convert.llama_params_from_hf(hf, cfg)

    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 128, size=n) for n in (7, 12)]
    steps = 6

    eng = ServingEngine(params, cfg, max_batch=2, page_size=16,
                        num_pages=64, max_pages_per_seq=8, max_seq_len=128)
    for p in prompts:
        eng.submit(p.astype(np.int32), max_new_tokens=steps)
    done = eng.run()

    for req, prompt in zip(done, prompts):
        with torch.no_grad():
            out = hf.generate(
                torch.asarray(prompt[None]), max_new_tokens=steps,
                do_sample=False, num_beams=1)
        want = out[0, len(prompt):].tolist()
        assert req.output == want, (req.output, want)
