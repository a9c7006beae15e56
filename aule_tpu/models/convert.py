"""HuggingFace checkpoint conversion into aule-tpu param trees.

The reference integrates with HF models by monkeypatching their attention
(python/aule/patching.py); here real checkpoints load natively instead:
`llama_params_from_hf` / `gpt2_params_from_hf` map a transformers
state_dict onto models/llama.py / models/gpt2.py param trees, validated
bit-for-bit against the torch forward in tests/test_convert.py.

Accepts either a transformers model instance or a plain
{name: tensor/ndarray} state dict; tensors are converted via numpy
(torch CPU -> numpy -> jax).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def _state_dict(model_or_sd) -> Mapping[str, Any]:
    if hasattr(model_or_sd, "state_dict"):
        return model_or_sd.state_dict()
    return model_or_sd


def llama_params_from_hf(model_or_sd, cfg, dtype=None) -> Dict[str, Any]:
    """transformers LlamaForCausalLM -> models/llama.py param tree.

    HF linear weights are [out, in] (transposed vs our [in, out]); HF's
    rotate_half RoPE is the same half-split convention as ops/rope.py.
    """
    sd = _state_dict(model_or_sd)
    dtype = dtype or cfg.dtype

    def w(name, transpose=True):
        x = _to_np(sd[name])
        return jnp.asarray(x.T if transpose else x, dtype)

    def norm(name):
        return jnp.asarray(_to_np(sd[name]), jnp.float32)

    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        layers.append({
            "wq": w(p + "self_attn.q_proj.weight"),
            "wk": w(p + "self_attn.k_proj.weight"),
            "wv": w(p + "self_attn.v_proj.weight"),
            "wo": w(p + "self_attn.o_proj.weight"),
            "w_gate": w(p + "mlp.gate_proj.weight"),
            "w_up": w(p + "mlp.up_proj.weight"),
            "w_down": w(p + "mlp.down_proj.weight"),
            "attn_norm": norm(p + "input_layernorm.weight"),
            "mlp_norm": norm(p + "post_attention_layernorm.weight"),
        })
    lm_head = ("lm_head.weight" if "lm_head.weight" in sd
               else "model.embed_tokens.weight")  # tied embeddings
    return {
        "embed": w("model.embed_tokens.weight", transpose=False),
        "layers": layers,
        "final_norm": norm("model.norm.weight"),
        "lm_head": w(lm_head),
    }


def gpt2_params_from_hf(model_or_sd, cfg, dtype=None) -> Dict[str, Any]:
    """transformers GPT2LMHeadModel -> models/gpt2.py param tree.

    GPT-2 uses Conv1D modules whose weights are already [in, out] — no
    transpose (unlike nn.Linear).
    """
    sd = _state_dict(model_or_sd)
    dtype = dtype or cfg.dtype

    def w(name):
        return jnp.asarray(_to_np(sd[name]), dtype)

    def strip(name):  # some dumps prefix "transformer."
        return name if name in sd else "transformer." + name

    layers = []
    for i in range(cfg.n_layers):
        p = strip(f"h.{i}.")
        if p not in ("",) and p + "ln_1.weight" not in sd:
            p = f"transformer.h.{i}."
        layers.append({
            "ln1_g": w(p + "ln_1.weight"),
            "ln1_b": w(p + "ln_1.bias"),
            # HF c_attn is fused [dim, 3*dim] with [Q|K|V] column blocks;
            # repack to qkv-major [3, dim, dim] (gpt2.py layout, which
            # head-shards under P(None, None, "model"))
            "w_qkv": jnp.transpose(
                w(p + "attn.c_attn.weight").reshape(cfg.dim, 3, cfg.dim),
                (1, 0, 2)),
            "qkv_b": w(p + "attn.c_attn.bias").reshape(3, cfg.dim),
            "w_proj": w(p + "attn.c_proj.weight"),
            "proj_b": w(p + "attn.c_proj.bias"),
            "ln2_g": w(p + "ln_2.weight"),
            "ln2_b": w(p + "ln_2.bias"),
            "w_fc": w(p + "mlp.c_fc.weight"),
            "fc_b": w(p + "mlp.c_fc.bias"),
            "w_out": w(p + "mlp.c_proj.weight"),
            "out_b": w(p + "mlp.c_proj.bias"),
        })
    return {
        "wte": w(strip("wte.weight")),
        "wpe": w(strip("wpe.weight")),
        "final_ln_g": w(strip("ln_f.weight")),
        "final_ln_b": w(strip("ln_f.bias")),
        "layers": layers,
    }
