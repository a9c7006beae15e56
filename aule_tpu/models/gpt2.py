"""Functional GPT-2-style decoder wired to the aule-tpu kernels.

The reference's model integration targets GPT-2 (python/aule/patching.py:
15-128 monkeypatches GPT2Attention.forward through its flash kernel); here
the equivalent is a native model family: MHA (Hkv == Hq), head_dim 64,
learned absolute position embeddings, pre-LN blocks, GELU MLP, weight-tied
LM head.  Exposes the same serving entry points as models/llama.py
(forward / decode_step_fused / prefill_step_fused) so the ServingEngine
drives either family.

Note head_dim=64: fused pools pad D to the 128-lane width
(ops/paged_fused.py::pad_head_dim) — exercised end-to-end by this family.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.flash import flash_attention_fwd

if hasattr(jax, "shard_map"):
    shard_map = jax.shard_map
else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


@dataclasses.dataclass
class GPT2Config:
    vocab_size: int = 50257
    n_ctx: int = 1024
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    # engine compatibility (MHA: kv heads == q heads)
    @property
    def n_kv_heads(self) -> int:
        return self.n_heads

    @property
    def hidden_dim(self) -> int:
        return 4 * self.dim

    @property
    def rope_base(self) -> float:  # engine builds (unused) rope tables
        return 10000.0

    @classmethod
    def tiny(cls, **kw) -> "GPT2Config":
        defaults = dict(vocab_size=256, n_ctx=256, dim=128, n_layers=2,
                        n_heads=2)
        defaults.update(kw)
        return cls(**defaults)


# PartitionSpecs for tensor-parallel sharding over a (data, model) mesh
# (llama.py::param_specs analog; MHA heads shard over `model`).
def param_specs(cfg: GPT2Config) -> Dict[str, Any]:
    layer = {
        "ln1_g": P(None), "ln1_b": P(None),
        "w_qkv": P(None, None, "model"),   # [3, dim, H*Dh] heads sharded
        "qkv_b": P(None, "model"),
        "w_proj": P("model", None),        # [H*Dh, dim] row-sharded
        "proj_b": P(None),
        "ln2_g": P(None), "ln2_b": P(None),
        "w_fc": P(None, "model"),
        "fc_b": P("model"),
        "w_out": P("model", None),
        "out_b": P(None),
    }
    return {
        "wte": P(None, None),
        "wpe": P(None, None),
        "final_ln_g": P(None),
        "final_ln_b": P(None),
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
    }


def init_params(cfg: GPT2Config, key: jax.Array) -> Dict[str, Any]:
    def dense(key, fan_in, shape):
        return (jax.random.normal(key, shape, jnp.float32)
                / jnp.sqrt(fan_in)).astype(cfg.dtype)

    keys = jax.random.split(key, 2 + 4 * cfg.n_layers)
    params: Dict[str, Any] = {
        "wte": dense(keys[0], cfg.dim, (cfg.vocab_size, cfg.dim)),
        "wpe": 0.01 * jax.random.normal(
            keys[1], (cfg.n_ctx, cfg.dim), jnp.float32).astype(cfg.dtype),
        "final_ln_g": jnp.ones((cfg.dim,), cfg.dtype),
        "final_ln_b": jnp.zeros((cfg.dim,), cfg.dtype),
        "layers": [],
    }
    for li in range(cfg.n_layers):
        k = keys[2 + 4 * li: 6 + 4 * li]
        params["layers"].append({
            "ln1_g": jnp.ones((cfg.dim,), cfg.dtype),
            "ln1_b": jnp.zeros((cfg.dim,), cfg.dtype),
            # qkv-major [3, dim, n_heads*head_dim]: each of Q/K/V is a
            # head-contiguous column block, so P(None, None, "model")
            # head-shards all three cleanly (the fused [dim, 3*dim]
            # layout cannot express that as a PartitionSpec)
            "w_qkv": dense(k[0], cfg.dim, (3, cfg.dim, cfg.dim)),
            "qkv_b": jnp.zeros((3, cfg.dim), cfg.dtype),
            "w_proj": dense(k[1], cfg.dim, (cfg.dim, cfg.dim)),
            "proj_b": jnp.zeros((cfg.dim,), cfg.dtype),
            "ln2_g": jnp.ones((cfg.dim,), cfg.dtype),
            "ln2_b": jnp.zeros((cfg.dim,), cfg.dtype),
            "w_fc": dense(k[2], cfg.dim, (cfg.dim, 4 * cfg.dim)),
            "fc_b": jnp.zeros((4 * cfg.dim,), cfg.dtype),
            "w_out": dense(k[3], 4 * cfg.dim, (4 * cfg.dim, cfg.dim)),
            "out_b": jnp.zeros((cfg.dim,), cfg.dtype),
        })
    return params


def layer_norm(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _split(x, n_heads, head_dim):
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, head_dim).transpose(0, 2, 1, 3)


def _merge(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _qkv(layer, h, cfg, ll=None, lora_idx=None):
    """QKV projections; the qkv-major [3, dim, H*Dh] layout maps the
    engine's per-projection LoRA targets (wq/wk/wv) onto slices of the
    fused weight (llama.py::_lora_proj semantics, one adapter bank API
    across model families)."""
    from .llama import _lora_proj

    w, bias = layer["w_qkv"], layer["qkv_b"]
    return (_split(_lora_proj(h, w[0], ll, "wq", lora_idx) + bias[0],
                   cfg.n_heads, cfg.head_dim),
            _split(_lora_proj(h, w[1], ll, "wk", lora_idx) + bias[1],
                   cfg.n_heads, cfg.head_dim),
            _split(_lora_proj(h, w[2], ll, "wv", lora_idx) + bias[2],
                   cfg.n_heads, cfg.head_dim))


def _mlp(layer, x, cfg):
    h = layer_norm(x, layer["ln2_g"], layer["ln2_b"], cfg.norm_eps)
    h = jax.nn.gelu(h @ layer["w_fc"] + layer["fc_b"])
    return x + h @ layer["w_out"] + layer["out_b"]


def forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,       # [B, S] int32
    cfg: GPT2Config,
    *,
    rope_cos=None,             # unused (learned positions); engine-compat
    rope_sin=None,
    positions: Optional[jnp.ndarray] = None,   # [B, S] absolute
    return_kv: bool = False,
    mesh=None,
    data_axis: str = "data",
    model_axis: str = "model",
    lora=None,
    lora_idx: Optional[jnp.ndarray] = None,
):
    """Causal-LM forward; returns logits [B, S, V] (+ per-layer (k, v)).

    With `mesh`, attention runs as a shard_map island (batch on
    `data_axis`, MHA heads on `model_axis`) and the dense layers
    partition via GSPMD from param_specs (llama.py::forward analog)."""
    def _attn_local(q, k, v):
        return flash_attention_fwd(q, k, v, causal=True, return_lse=False)

    if mesh is None:
        attn_fn = _attn_local
    else:
        spec = P(data_axis, model_axis, None, None)
        attn_fn = shard_map(_attn_local, mesh=mesh,
                            in_specs=(spec, spec, spec), out_specs=spec,
                            check_vma=False)
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    from .llama import _lora_at, _lora_proj

    x = params["wte"][tokens] + params["wpe"][positions]
    kv_out = []
    for li, layer in enumerate(params["layers"]):
        ll = _lora_at(lora, li)
        h = layer_norm(x, layer["ln1_g"], layer["ln1_b"], cfg.norm_eps)
        q, k, v = _qkv(layer, h, cfg, ll, lora_idx)
        if return_kv:
            kv_out.append((k, v))
        attn = attn_fn(q, k, v)
        x = x + (_lora_proj(_merge(attn), layer["w_proj"], ll, "wo",
                            lora_idx) + layer["proj_b"])
        x = _mlp(layer, x, cfg)
    x = layer_norm(x, params["final_ln_g"], params["final_ln_b"],
                   cfg.norm_eps)
    logits = (x @ params["wte"].T).astype(jnp.float32)
    if return_kv:
        return logits, kv_out
    return logits


def decode_step_fused(
    params: Dict[str, Any],
    token: jnp.ndarray,            # [B] int32
    positions: jnp.ndarray,        # [B] int32 absolute
    kv_pages: List[jnp.ndarray],
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    cfg: GPT2Config,
    rope_cos=None,
    rope_sin=None,
    kv_scales: Optional[List[jnp.ndarray]] = None,
    mesh=None,
    model_axis: str = "model",
    lora=None,
    lora_idx: Optional[jnp.ndarray] = None,
):
    """One decode step over fused pools (signature mirrors llama's).

    With `mesh`, the append+attend is a shard_map island with MHA heads
    sharded over `model_axis` (llama.py::decode_step_fused analog);
    pools are head-sharded [P, 2, Hkv/tp, page, D]."""
    from ..ops.paged_fused import (
        kv_cache_append_decode_fused,
        paged_attention_fused,
    )

    quantized = kv_scales is not None

    def _attend_local(q, k, v, kvp, sc, bt, lens):
        if quantized:
            kvp, sc, lens_out = kv_cache_append_decode_fused(
                kvp, k, v, bt, lens, kv_scales=sc)
            attn = paged_attention_fused(q, kvp, bt, lens_out,
                                         kv_scales=sc)
        else:
            kvp, lens_out = kv_cache_append_decode_fused(
                kvp, k, v, bt, lens)
            attn = paged_attention_fused(q, kvp, bt, lens_out)
        return attn, kvp, sc, lens_out

    if mesh is not None:
        hspec = P(None, model_axis, None)
        pool_spec = P(None, None, model_axis, None, None)
        sc_spec = P(None, None, model_axis) if quantized else P()
        attend = shard_map(
            _attend_local, mesh=mesh,
            in_specs=(hspec, hspec, hspec, pool_spec, sc_spec,
                      P(None, None), P(None)),
            out_specs=(hspec, pool_spec, sc_spec, P(None)),
            check_vma=False)
    else:
        attend = _attend_local

    from .llama import _lora_at, _lora_proj

    x = params["wte"][token] + params["wpe"][positions]
    new_kv, new_sc = [], []
    lens_out = context_lens
    for li, layer in enumerate(params["layers"]):
        ll = _lora_at(lora, li)
        h = layer_norm(x, layer["ln1_g"], layer["ln1_b"], cfg.norm_eps)
        w, bias = layer["w_qkv"], layer["qkv_b"]
        q = (_lora_proj(h, w[0], ll, "wq", lora_idx)
             + bias[0]).reshape(-1, cfg.n_heads, cfg.head_dim)
        k = (_lora_proj(h, w[1], ll, "wk", lora_idx)
             + bias[1]).reshape(-1, cfg.n_heads, cfg.head_dim)
        v = (_lora_proj(h, w[2], ll, "wv", lora_idx)
             + bias[2]).reshape(-1, cfg.n_heads, cfg.head_dim)
        sci = kv_scales[li] if quantized else jnp.zeros((), jnp.float32)
        attn, kv, sc, lens_out = attend(
            q, k, v, kv_pages[li], sci, block_tables, context_lens)
        if quantized:
            new_sc.append(sc)
        new_kv.append(kv)
        x = x + (_lora_proj(attn.reshape(-1, cfg.dim), layer["w_proj"],
                            ll, "wo", lora_idx) + layer["proj_b"])
        x = _mlp(layer, x, cfg)
    x = layer_norm(x, params["final_ln_g"], params["final_ln_b"],
                   cfg.norm_eps)
    logits = (x @ params["wte"].T).astype(jnp.float32)
    if quantized:
        return logits, new_kv, lens_out, new_sc
    return logits, new_kv, lens_out


def prefill_step_fused(
    params: Dict[str, Any],
    tokens: jnp.ndarray,           # [B, S_chunk]
    q_offsets: jnp.ndarray,        # [B]
    seq_lens: jnp.ndarray,         # [B]
    kv_pages: List[jnp.ndarray],
    block_tables: jnp.ndarray,
    cfg: GPT2Config,
    rope_cos=None,
    rope_sin=None,
    kv_scales: Optional[List[jnp.ndarray]] = None,
    mesh=None,
    model_axis: str = "model",
    all_logits: bool = False,
    lora=None,
    lora_idx: Optional[jnp.ndarray] = None,
):
    """Chunked prefill over fused pools (signature mirrors llama's).

    all_logits=True returns per-position logits [B, S, V] for
    speculative-decode verification (llama.py analog).

    With `mesh`, append+attend shard MHA heads over `model_axis`
    (llama.py::prefill_step_fused analog)."""
    from ..ops.paged_fused import (
        kv_cache_append_prefill_fused,
        paged_attention_prefill,
    )

    quantized = kv_scales is not None

    def _attend_local(q, k, v, kvp, sc, bt, qoff, slens):
        if quantized:
            kvp, sc, lens_out = kv_cache_append_prefill_fused(
                kvp, k, v, bt, qoff, slens, kv_scales=sc)
            attn = paged_attention_prefill(
                q, kvp, bt, lens_out, q_offsets=qoff, causal=True,
                kv_scales=sc)
        else:
            kvp, lens_out = kv_cache_append_prefill_fused(
                kvp, k, v, bt, qoff, slens)
            attn = paged_attention_prefill(
                q, kvp, bt, lens_out, q_offsets=qoff, causal=True)
        return attn, kvp, sc, lens_out

    if mesh is not None:
        hspec = P(None, model_axis, None, None)
        pool_spec = P(None, None, model_axis, None, None)
        sc_spec = P(None, None, model_axis) if quantized else P()
        attend = shard_map(
            _attend_local, mesh=mesh,
            in_specs=(hspec, hspec, hspec, pool_spec, sc_spec,
                      P(None, None), P(None), P(None)),
            out_specs=(hspec, pool_spec, sc_spec, P(None)),
            check_vma=False)
    else:
        attend = _attend_local

    from .llama import _lora_at, _lora_proj

    b, s_chunk = tokens.shape
    positions = q_offsets[:, None] + jnp.arange(s_chunk, dtype=jnp.int32)
    x = params["wte"][tokens] + params["wpe"][positions]
    new_kv, new_sc = [], []
    lens_out = q_offsets + seq_lens
    for li, layer in enumerate(params["layers"]):
        ll = _lora_at(lora, li)
        h = layer_norm(x, layer["ln1_g"], layer["ln1_b"], cfg.norm_eps)
        q, k, v = _qkv(layer, h, cfg, ll, lora_idx)
        sci = kv_scales[li] if quantized else jnp.zeros((), jnp.float32)
        attn, kv, sc, lens_out = attend(
            q, k, v, kv_pages[li], sci, block_tables, q_offsets, seq_lens)
        if quantized:
            new_sc.append(sc)
        new_kv.append(kv)
        x = x + (_lora_proj(_merge(attn), layer["w_proj"], ll, "wo",
                            lora_idx) + layer["proj_b"])
        x = _mlp(layer, x, cfg)
    if all_logits:
        xn = layer_norm(x, params["final_ln_g"], params["final_ln_b"],
                        cfg.norm_eps)
        logits = (xn @ params["wte"].T).astype(jnp.float32)  # [B, S, V]
    else:
        last = jnp.take_along_axis(
            x, jnp.maximum(seq_lens - 1, 0)[:, None, None], axis=1)[:, 0]
        last = layer_norm(last, params["final_ln_g"], params["final_ln_b"],
                          cfg.norm_eps)
        logits = (last @ params["wte"].T).astype(jnp.float32)
    if quantized:
        return logits, new_kv, lens_out, new_sc
    return logits, new_kv, lens_out
