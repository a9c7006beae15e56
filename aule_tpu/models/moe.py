"""Mixture-of-Experts Llama (Mixtral-style) + expert parallelism.

Net-new model family (the reference is a kernel library with no MoE;
SURVEY.md §2.4 lists expert parallelism among the absent axes).  The
attention stack is models/llama.py's (flash kernels, RoPE, GQA); the MLP
becomes a top-k routed mixture:

  router: [dim, E] linear -> softmax over top_k experts per token
  expert: SwiGLU MLP (w_gate, w_up, w_down), E copies

Two execution forms, numerically identical:

  * `forward` — single-device: capacity-free gather-style evaluation
    (every expert runs on a mask-weighted view; exact, simple, the test
    oracle).
  * `make_expert_parallel_forward` — EP over an `expert` mesh axis
    (GShard-style): gating computes a capacity-C one-hot dispatch tensor,
    each shard einsum-gathers its LOCAL experts' token buckets, runs the
    expert MLP batched [E_local, C, dim], and the combine psum-reduces
    over the expert axis — the only cross-shard traffic is one [T, dim]
    psum (tokens ride replicated; pair with data parallelism for batch
    scale).  Tokens overflowing an expert's capacity drop (standard
    GShard semantics) — capacity_factor sizes the buckets.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.rope import apply_rope, precompute_rope_frequencies
from . import llama

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@dataclasses.dataclass(frozen=True)
class MoEConfig(llama.LlamaConfig):
    n_experts: int = 8
    top_k: int = 2

    @classmethod
    def tiny(cls, **kw) -> "MoEConfig":
        defaults = dict(vocab_size=256, dim=128, n_layers=2, n_heads=4,
                        n_kv_heads=2, hidden_dim=128, rope_base=10000.0,
                        dtype=jnp.float32, n_experts=4, top_k=2)
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def mixtral_8x7b(cls) -> "MoEConfig":
        return cls(vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
                   n_kv_heads=8, hidden_dim=14336, rope_base=1e6,
                   n_experts=8, top_k=2)


def init_params(cfg: MoEConfig, key: jax.Array) -> Dict[str, Any]:
    """Llama params with each layer's MLP replaced by router + E experts
    (expert weights stacked on a leading [E] dim — EP-shardable)."""
    base = llama.init_params(cfg, key)
    keys = jax.random.split(jax.random.fold_in(key, 17), cfg.n_layers)

    def dense(key, fan_in, shape):
        return (jax.random.normal(key, shape, jnp.float32)
                / np.sqrt(fan_in)).astype(cfg.dtype)

    d, h, e = cfg.dim, cfg.hidden_dim, cfg.n_experts
    for li, layer in enumerate(base["layers"]):
        lk = jax.random.split(keys[li], 4)
        for k in ("w_gate", "w_up", "w_down"):
            del layer[k]
        layer["router"] = dense(lk[0], d, (d, e))
        layer["e_gate"] = dense(lk[1], d, (e, d, h))
        layer["e_up"] = dense(lk[2], d, (e, d, h))
        layer["e_down"] = dense(lk[3], h, (e, h, d))
    return base


def param_specs(cfg: MoEConfig, expert_axis: Optional[str] = None,
                model_axis: Optional[str] = "model") -> Dict[str, Any]:
    """PartitionSpecs: attention shards like llama's (model axis); expert
    weights shard their leading [E] dim over `expert_axis` when given."""
    ex = expert_axis
    layer = {
        "wq": P(None, model_axis),
        "wk": P(None, model_axis),
        "wv": P(None, model_axis),
        "wo": P(model_axis, None),
        "attn_norm": P(None),
        "mlp_norm": P(None),
        "router": P(None, None),
        "e_gate": P(ex, None, None),
        "e_up": P(ex, None, None),
        "e_down": P(ex, None, None),
    }
    return {
        "embed": P(None, None),
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
        "final_norm": P(None),
        "lm_head": P(None, model_axis),
    }


def _gating(layer, x, cfg: MoEConfig):
    """(weights [T, E] with exactly top_k nonzeros summing to 1, logits)."""
    logits = (x @ layer["router"]).astype(jnp.float32)  # [T, E]
    top_vals, top_idx = jax.lax.top_k(logits, cfg.top_k)
    gates = jax.nn.softmax(top_vals, axis=-1)           # renormalized
    onehot = jax.nn.one_hot(top_idx, cfg.n_experts,
                            dtype=jnp.float32)          # [T, k, E]
    return jnp.einsum("tk,tke->te", gates, onehot), logits


def _expert_mlp(eg, eu, ed, x):
    """Batched expert SwiGLU on [..., dim] with [E?..., dim, hid] weights."""
    gate = jax.nn.silu((x @ eg).astype(jnp.float32))
    return ((gate * (x @ eu).astype(jnp.float32)).astype(x.dtype)) @ ed


def _moe_mlp_dense(layer, x, cfg: MoEConfig):
    """Exact single-device evaluation: every expert runs on every token,
    mask-weighted.  O(E * T) compute — the oracle/simple path."""
    b, s, d = x.shape
    xt = x.reshape(b * s, d)
    weights, _ = _gating(layer, xt, cfg)                # [T, E]
    outs = jax.vmap(
        lambda eg, eu, ed: _expert_mlp(eg, eu, ed, xt)
    )(layer["e_gate"], layer["e_up"], layer["e_down"])  # [E, T, d]
    y = jnp.einsum("etd,te->td", outs.astype(jnp.float32), weights)
    return y.astype(x.dtype).reshape(b, s, d)


def forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    cfg: MoEConfig,
    *,
    rope_cos=None,
    rope_sin=None,
    return_kv: bool = False,
    return_aux: bool = False,
    moe_mlp=None,
    mesh=None,
    data_axis: str = "data",
    model_axis: str = "model",
    lora=None,
    lora_idx=None,
):
    """Causal-LM forward; `moe_mlp(layer, x, cfg)` pluggable so the EP
    wrapper reuses this exact skeleton.  With return_aux, also returns
    the load-balancing auxiliary loss (mean over layers of
    E * sum_e frac_e * prob_e, computed on the TRUE router inputs)."""
    b, s = tokens.shape
    if rope_cos is None:
        rope_cos, rope_sin = precompute_rope_frequencies(
            s, cfg.head_dim, cfg.rope_base)
    attn_fn = llama._make_attn_fn(cfg, mesh, data_axis, model_axis)
    mlp = moe_mlp or _moe_mlp_dense
    x = params["embed"][tokens]
    kv_out = []
    aux = 0.0
    for li, layer in enumerate(params["layers"]):
        ll = llama._lora_at(lora, li)
        h = llama.rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q = llama._split_heads(
            llama._lora_proj(h, layer["wq"], ll, "wq", lora_idx),
            cfg.n_heads, cfg.head_dim)
        k = llama._split_heads(
            llama._lora_proj(h, layer["wk"], ll, "wk", lora_idx),
            cfg.n_kv_heads, cfg.head_dim)
        v = llama._split_heads(
            llama._lora_proj(h, layer["wv"], ll, "wv", lora_idx),
            cfg.n_kv_heads, cfg.head_dim)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        if return_kv:
            kv_out.append((k, v))
        attn = attn_fn(q, k, v)
        x = x + llama._lora_proj(llama._merge_heads(attn), layer["wo"],
                                 ll, "wo", lora_idx)
        h = llama.rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        if return_aux:
            w, rl = _gating(layer, h.reshape(-1, cfg.dim), cfg)
            frac = jnp.mean((w > 0).astype(jnp.float32), axis=0)
            prob = jnp.mean(jax.nn.softmax(rl, axis=-1), axis=0)
            aux = aux + cfg.n_experts * jnp.sum(frac * prob)
        x = x + mlp(layer, h, cfg)
    x = llama.rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    out = (logits,)
    if return_kv:
        out = out + (kv_out,)
    if return_aux:
        out = out + (aux / cfg.n_layers,)
    return out if len(out) > 1 else logits


# ---------------------------------------------------------------------------
# expert parallelism (GShard-style capacity dispatch over an `expert` axis)
# ---------------------------------------------------------------------------


def _dispatch_tensors(weights, cfg: MoEConfig, capacity: int):
    """(dispatch [T, E, C] one-hot, combine [T, E, C] gate-weighted).

    Position-in-expert via cumsum of the per-expert assignment mask;
    tokens past `capacity` drop (GShard semantics)."""
    assign = (weights > 0.0).astype(jnp.int32)          # [T, E]
    pos = jnp.cumsum(assign, axis=0) * assign - 1       # [T, E], -1 = n/a
    keep = jnp.logical_and(assign == 1, pos < capacity)
    pos_oh = jax.nn.one_hot(jnp.where(keep, pos, -1), capacity,
                            dtype=jnp.float32)          # [T, E, C]
    dispatch = pos_oh
    combine = dispatch * weights[..., None]
    return dispatch, combine


def expert_capacity(tokens: int, cfg: MoEConfig,
                    capacity_factor: float = 2.0) -> int:
    c = int(np.ceil(tokens * cfg.top_k / cfg.n_experts * capacity_factor))
    return max(c, cfg.top_k)


def make_expert_parallel_mlp(
    mesh: Mesh,
    cfg: MoEConfig,
    *,
    expert_axis: str = "expert",
    capacity_factor: float = 2.0,
):
    """Returns moe_mlp(layer, x, cfg) running experts sharded over
    `expert_axis`.  Tokens replicate across the expert axis; the combine
    psum is the only cross-shard traffic."""
    n_ex = int(mesh.shape[expert_axis])
    if cfg.n_experts % n_ex:
        raise ValueError(f"n_experts {cfg.n_experts} % {n_ex} != 0")
    e_local = cfg.n_experts // n_ex

    def local_mlp(router, eg, eu, ed, x):
        # x [b, s, d] replicated; eg/eu/ed local [E/n, ...]
        b, s, d = x.shape
        xt = x.reshape(b * s, d)
        weights, _ = _gating({"router": router}, xt, cfg)  # [T, E] global
        cap = expert_capacity(b * s, cfg, capacity_factor)
        dispatch, combine = _dispatch_tensors(weights, cfg, cap)
        shard = jax.lax.axis_index(expert_axis)
        lo = shard * e_local
        disp_l = jax.lax.dynamic_slice_in_dim(dispatch, lo, e_local, 1)
        comb_l = jax.lax.dynamic_slice_in_dim(combine, lo, e_local, 1)
        # gather local expert buckets: [E/n, C, d]
        buckets = jnp.einsum("tec,td->ecd", disp_l,
                             xt.astype(jnp.float32)).astype(x.dtype)
        outs = jax.vmap(_expert_mlp)(eg, eu, ed, buckets)  # [E/n, C, d]
        y = jnp.einsum("ecd,tec->td", outs.astype(jnp.float32), comb_l)
        y = jax.lax.psum(y, expert_axis)
        return y.astype(x.dtype).reshape(b, s, d)

    smapped = shard_map(
        local_mlp, mesh=mesh,
        in_specs=(P(None, None), P(expert_axis, None, None),
                  P(expert_axis, None, None), P(expert_axis, None, None),
                  P(None, None, None)),
        out_specs=P(None, None, None),
        check_vma=False,
    )

    def moe_mlp(layer, x, cfg_):
        return smapped(layer["router"], layer["e_gate"], layer["e_up"],
                       layer["e_down"], x)

    return moe_mlp


def make_expert_parallel_forward(mesh: Mesh, cfg: MoEConfig,
                                 expert_axis: str = "expert",
                                 capacity_factor: float = 2.0):
    mlp = make_expert_parallel_mlp(mesh, cfg, expert_axis=expert_axis,
                                   capacity_factor=capacity_factor)

    def fn(params, tokens):
        return forward(params, tokens, cfg, moe_mlp=mlp)

    return fn


def loss_fn(params, tokens, cfg: MoEConfig, moe_mlp=None,
            aux_weight: float = 1e-2):
    """Next-token NLL + the standard load-balancing auxiliary loss."""
    logits, aux = forward(params, tokens[:, :-1], cfg, moe_mlp=moe_mlp,
                          return_aux=True)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))
    return nll + aux_weight * aux


def train_step(params, tokens, cfg: MoEConfig, lr: float = 1e-4,
               moe_mlp=None):
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg,
                                              moe_mlp)
    params = jax.tree.map(
        lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype),
        params, grads)
    return params, loss


# ---------------------------------------------------------------------------
# serving surface (ServingEngine model interface: forward/return_kv +
# decode_step_fused + prefill_step_fused — mirrors models/llama.py)
# ---------------------------------------------------------------------------


def decode_step_fused(
    params: Dict[str, Any],
    token: jnp.ndarray,            # [B]
    positions: jnp.ndarray,        # [B]
    kv_pages,                      # per-layer fused pools
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    cfg: MoEConfig,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    kv_scales=None,
    mesh=None,
    model_axis: str = "model",
    moe_mlp=None,
    lora=None,
    lora_idx=None,
):
    """One decode step over fused pools with the routed-MoE MLP.  The
    attention append+attend matches llama.decode_step_fused (incl. the
    TP shard_map island); the MLP runs the dense mixture (or a provided
    expert-parallel moe_mlp) on the [B, 1, dim] stream."""
    from ..ops.paged_fused import (
        kv_cache_append_decode_fused,
        paged_attention_fused,
    )

    quantized = kv_scales is not None
    dec_window = cfg.window_size + 1 if cfg.window_size > 0 else -1
    mlp = moe_mlp or _moe_mlp_dense

    def _attend_local(q, k, v, kvp, sc, bt, lens):
        if quantized:
            kvp, sc, lens_out = kv_cache_append_decode_fused(
                kvp, k, v, bt, lens, kv_scales=sc)
            attn = paged_attention_fused(q, kvp, bt, lens_out,
                                         kv_scales=sc,
                                         window_size=dec_window)
        else:
            kvp, lens_out = kv_cache_append_decode_fused(
                kvp, k, v, bt, lens)
            attn = paged_attention_fused(q, kvp, bt, lens_out,
                                         window_size=dec_window)
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

    x = params["embed"][token]
    new_kv, new_sc = [], []
    lens_out = context_lens
    c = rope_cos[positions][:, None, :]
    sn = rope_sin[positions][:, None, :]
    half = cfg.head_dim // 2
    for li, layer in enumerate(params["layers"]):
        ll = llama._lora_at(lora, li)
        h = llama.rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q = llama._lora_proj(h, layer["wq"], ll, "wq", lora_idx).reshape(
            -1, cfg.n_heads, cfg.head_dim)
        k = llama._lora_proj(h, layer["wk"], ll, "wk", lora_idx).reshape(
            -1, cfg.n_kv_heads, cfg.head_dim)
        v = llama._lora_proj(h, layer["wv"], ll, "wv", lora_idx).reshape(
            -1, cfg.n_kv_heads, cfg.head_dim)
        q = jnp.concatenate(
            [q[..., :half] * c - q[..., half:] * sn,
             q[..., :half] * sn + q[..., half:] * c],
            axis=-1).astype(q.dtype)
        k = jnp.concatenate(
            [k[..., :half] * c - k[..., half:] * sn,
             k[..., :half] * sn + k[..., half:] * c],
            axis=-1).astype(k.dtype)

        sci = (kv_scales[li] if quantized
               else jnp.zeros((), jnp.float32))
        attn, kv, sc, lens_out = attend(
            q, k, v, kv_pages[li], sci, block_tables, context_lens)
        if quantized:
            new_sc.append(sc)
        new_kv.append(kv)
        x = x + llama._lora_proj(
            attn.reshape(-1, cfg.n_heads * cfg.head_dim), layer["wo"],
            ll, "wo", lora_idx)
        h = llama.rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        x = x + mlp(layer, h[:, None, :], cfg)[:, 0]

    x = llama.rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    if quantized:
        return logits, new_kv, lens_out, new_sc
    return logits, new_kv, lens_out


def prefill_step_fused(
    params: Dict[str, Any],
    tokens: jnp.ndarray,           # [B, S_chunk]
    q_offsets: jnp.ndarray,
    seq_lens: jnp.ndarray,
    kv_pages,
    block_tables: jnp.ndarray,
    cfg: MoEConfig,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    kv_scales=None,
    mesh=None,
    model_axis: str = "model",
    moe_mlp=None,
    all_logits: bool = False,
    lora=None,
    lora_idx=None,
):
    """Chunked prefill over fused pools with the routed-MoE MLP
    (mirrors llama.prefill_step_fused, incl. all_logits=True returning
    per-position logits [B, S, V] for speculative-decode verification)."""
    from ..ops.paged_fused import (
        kv_cache_append_prefill_fused,
        paged_attention_prefill,
    )

    quantized = kv_scales is not None
    mlp = moe_mlp or _moe_mlp_dense

    def _attend_local(q, k, v, kvp, sc, bt, qoff, slens):
        if quantized:
            kvp, sc, lens_out = kv_cache_append_prefill_fused(
                kvp, k, v, bt, qoff, slens, kv_scales=sc)
            attn = paged_attention_prefill(
                q, kvp, bt, lens_out, q_offsets=qoff, causal=True,
                window_size=cfg.window_size, kv_scales=sc)
        else:
            kvp, lens_out = kv_cache_append_prefill_fused(
                kvp, k, v, bt, qoff, slens)
            attn = paged_attention_prefill(
                q, kvp, bt, lens_out, q_offsets=qoff, causal=True,
                window_size=cfg.window_size)
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

    b, s_chunk = tokens.shape
    positions = q_offsets[:, None] + jnp.arange(s_chunk, dtype=jnp.int32)
    x = params["embed"][tokens]
    new_kv, new_sc = [], []
    lens_out = q_offsets + seq_lens
    for li, layer in enumerate(params["layers"]):
        ll = llama._lora_at(lora, li)
        h = llama.rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q = llama._split_heads(
            llama._lora_proj(h, layer["wq"], ll, "wq", lora_idx),
            cfg.n_heads, cfg.head_dim)
        k = llama._split_heads(
            llama._lora_proj(h, layer["wk"], ll, "wk", lora_idx),
            cfg.n_kv_heads, cfg.head_dim)
        v = llama._split_heads(
            llama._lora_proj(h, layer["wv"], ll, "wv", lora_idx),
            cfg.n_kv_heads, cfg.head_dim)
        q = apply_rope(q, rope_cos, rope_sin, positions[:, None])
        k = apply_rope(k, rope_cos, rope_sin, positions[:, None])

        sci = (kv_scales[li] if quantized
               else jnp.zeros((), jnp.float32))
        attn, kv, sc, lens_out = attend(
            q, k, v, kv_pages[li], sci, block_tables, q_offsets, seq_lens)
        if quantized:
            new_sc.append(sc)
        new_kv.append(kv)
        x = x + llama._lora_proj(llama._merge_heads(attn), layer["wo"],
                                 ll, "wo", lora_idx)
        h = llama.rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        x = x + mlp(layer, h, cfg)

    if all_logits:
        xn = llama.rms_norm(x, params["final_norm"], cfg.norm_eps)
        logits = (xn @ params["lm_head"]).astype(jnp.float32)  # [B, S, V]
    else:
        last = jnp.take_along_axis(
            x, jnp.maximum(seq_lens - 1, 0)[:, None, None], axis=1)[:, 0]
        last = llama.rms_norm(last, params["final_norm"], cfg.norm_eps)
        logits = (last @ params["lm_head"]).astype(jnp.float32)
    if quantized:
        return logits, new_kv, lens_out, new_sc
    return logits, new_kv, lens_out
