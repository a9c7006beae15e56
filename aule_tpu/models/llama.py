"""Llama-style transformer built on aule-tpu attention.

The reference integrates with models by monkeypatching HF GPT-2
(python/aule/patching.py) and simulates a transformer in tests
(tests/test_real_transformer.py).  Here the model is first-class: a
functional (pure-pytree) Llama-3-shaped decoder that uses

  * ops.flash (Pallas flash kernel, fused path) for prefill/training,
  * ops.paged (paged decode kernel) + serving.kv_cache for generation,
  * RoPE from ops.rope (half-split convention),

and whose parameters carry `jax.sharding` PartitionSpecs so the same code
runs single-chip or pjit-sharded over a (data, model) mesh — the flagship
for __graft_entry__ and bench.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.flash_vjp import flash_attention_vjp
from ..ops.paged import (
    kv_cache_append_decode,
    kv_cache_append_decode_quantized,
    paged_attention,
)
from ..ops.rope import apply_rope, precompute_rope_frequencies

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    hidden_dim: int = 14336
    rope_base: float = 500000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    # sliding-window attention (Mistral-style); -1 = full attention.
    # Prefill uses the flash window mask; decode restricts the paged
    # kernel to the trailing `window_size` tokens.
    window_size: int = -1

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @classmethod
    def llama3_8b(cls) -> "LlamaConfig":
        return cls(vocab_size=128256, dim=4096, n_layers=32, n_heads=32,
                   n_kv_heads=8, hidden_dim=14336)

    @classmethod
    def mistral_7b(cls) -> "LlamaConfig":
        """Mistral-7B shape: Llama architecture + 4096-token sliding
        window (the reference's Mistral benchmark target,
        python/README.md:23)."""
        return cls(vocab_size=32000, dim=4096, n_layers=32, n_heads=32,
                   n_kv_heads=8, hidden_dim=14336, rope_base=10000.0,
                   window_size=4096)

    @classmethod
    def tiny(cls, **kw) -> "LlamaConfig":
        """Test-sized config."""
        defaults = dict(vocab_size=256, dim=128, n_layers=2, n_heads=4,
                        n_kv_heads=2, hidden_dim=256, rope_base=10000.0,
                        dtype=jnp.float32)
        defaults.update(kw)
        return cls(**defaults)


# PartitionSpecs for tensor-parallel sharding over a (data, model) mesh.
def param_specs(cfg: LlamaConfig) -> Dict[str, Any]:
    layer = {
        "wq": P(None, "model"),      # [dim, Hq*Dh] heads sharded
        "wk": P(None, "model"),
        "wv": P(None, "model"),
        "wo": P("model", None),      # [Hq*Dh, dim] row-sharded
        "w_gate": P(None, "model"),
        "w_up": P(None, "model"),
        "w_down": P("model", None),
        "attn_norm": P(None),
        "mlp_norm": P(None),
    }
    return {
        "embed": P(None, None),
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
        "final_norm": P(None),
        "lm_head": P(None, "model"),
    }


def init_params(cfg: LlamaConfig, key: jax.Array) -> Dict[str, Any]:
    def dense(key, fan_in, shape):
        return (jax.random.normal(key, shape, jnp.float32)
                / np.sqrt(fan_in)).astype(cfg.dtype)

    keys = jax.random.split(key, cfg.n_layers + 3)
    d, h = cfg.dim, cfg.hidden_dim
    qkv_dim = cfg.n_heads * cfg.head_dim
    kv_dim = cfg.n_kv_heads * cfg.head_dim
    layers = []
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[i], 7)
        layers.append({
            "wq": dense(lk[0], d, (d, qkv_dim)),
            "wk": dense(lk[1], d, (d, kv_dim)),
            "wv": dense(lk[2], d, (d, kv_dim)),
            "wo": dense(lk[3], qkv_dim, (qkv_dim, d)),
            "w_gate": dense(lk[4], d, (d, h)),
            "w_up": dense(lk[5], d, (d, h)),
            "w_down": dense(lk[6], h, (h, d)),
            "attn_norm": jnp.ones((d,), jnp.float32),
            "mlp_norm": jnp.ones((d,), jnp.float32),
        })
    return {
        "embed": dense(keys[-3], 1, (cfg.vocab_size, d)),
        "layers": layers,
        "final_norm": jnp.ones((cfg.dim,), jnp.float32),
        "lm_head": dense(keys[-2], d, (d, cfg.vocab_size)),
    }


def rms_norm(x, weight, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * weight).astype(x.dtype)


def _split_heads(x, n_heads, head_dim):
    b, s, _ = x.shape
    # [B, S, H*Dh] -> [B, H, S, Dh]
    return x.reshape(b, s, n_heads, head_dim).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def _make_attn_fn(cfg: LlamaConfig, mesh, data_axis: str,
                  model_axis: str):
    """Attention callsite: plain kernel single-mesh-free, or a shard_map
    island (batch on data, heads on model — GQA co-located) inside the
    surrounding GSPMD program.  Pallas kernels have no SPMD partitioning
    rule, so the explicit shard_map is what keeps the kernel local to each
    chip's head/batch shard."""
    def local(q, k, v):
        return flash_attention_vjp(q, k, v, causal=True,
                                   window_size=cfg.window_size)

    if mesh is None:
        return local
    spec = P(data_axis, model_axis, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)


def _lora_proj(h, w, lora_layer, name, idx):
    """h @ w plus a per-ROW low-rank LoRA delta h @ A_i @ B_i, where
    row b uses adapter idx[b] from the stacked bank (multi-LoRA
    serving: different requests in one batch run different adapters).

    lora_layer[name] = (A [N, d, r], B [N, r, o]) stacked over N
    adapters; the alpha/r scaling is expected to be folded into B at
    registration time; an all-zeros adapter row means 'base model'.
    h is [B, d] (decode) or [B, S, d] (prefill/verify chunks)."""
    out = h @ w
    if lora_layer is None or idx is None or name not in lora_layer:
        return out
    a, b = lora_layer[name]
    ai = a[idx].astype(jnp.float32)      # [B, d, r]
    bi = b[idx].astype(jnp.float32)      # [B, r, o]
    hf = h.astype(jnp.float32)
    if h.ndim == 2:
        d = jnp.einsum("bd,bdr->br", hf, ai)
        d = jnp.einsum("br,bro->bo", d, bi)
    else:
        d = jnp.einsum("bsd,bdr->bsr", hf, ai)
        d = jnp.einsum("bsr,bro->bso", d, bi)
    return out + d.astype(out.dtype)


def _lora_at(lora, li):
    return None if lora is None else lora["layers"][li]


def forward(
    params: Dict[str, Any],
    tokens: jnp.ndarray,       # [B, S] int32
    cfg: LlamaConfig,
    *,
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    return_kv: bool = False,
    mesh=None,
    data_axis: str = "data",
    model_axis: str = "model",
    lora=None,
    lora_idx: Optional[jnp.ndarray] = None,
):
    """Causal-LM forward (prefill/training path, flash kernels).

    Returns logits [B, S, V]; with return_kv also per-layer rotated
    (k, v) [B, Hkv, S, Dh] for populating a decode cache.  With `mesh`,
    attention runs as a shard_map island (data/model sharded) and the
    dense layers partition via GSPMD.
    """
    b, s = tokens.shape
    if rope_cos is None:
        rope_cos, rope_sin = precompute_rope_frequencies(
            s, cfg.head_dim, cfg.rope_base)
    attn_fn = _make_attn_fn(cfg, mesh, data_axis, model_axis)
    x = params["embed"][tokens]
    kv_out: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    for li, layer in enumerate(params["layers"]):
        ll = _lora_at(lora, li)
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q = _split_heads(_lora_proj(h, layer["wq"], ll, "wq", lora_idx),
                         cfg.n_heads, cfg.head_dim)
        k = _split_heads(_lora_proj(h, layer["wk"], ll, "wk", lora_idx),
                         cfg.n_kv_heads, cfg.head_dim)
        v = _split_heads(_lora_proj(h, layer["wv"], ll, "wv", lora_idx),
                         cfg.n_kv_heads, cfg.head_dim)
        # rotate outside the kernel so training grads flow (see flash_vjp)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        if return_kv:
            kv_out.append((k, v))
        attn = attn_fn(q, k, v)
        x = x + _lora_proj(_merge_heads(attn), layer["wo"], ll, "wo",
                           lora_idx)

        h = rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        gate = jax.nn.silu((h @ layer["w_gate"]).astype(jnp.float32))
        x = x + ((gate * (h @ layer["w_up"]).astype(jnp.float32)).astype(
            x.dtype) @ layer["w_down"])

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    if return_kv:
        return logits, kv_out
    return logits


def decode_step(
    params: Dict[str, Any],
    token: jnp.ndarray,          # [B] int32 current token
    positions: jnp.ndarray,      # [B] int32 absolute positions
    k_pages: List[jnp.ndarray],  # per-layer pools
    v_pages: List[jnp.ndarray],
    block_tables: jnp.ndarray,   # [B, max_pages]
    context_lens: jnp.ndarray,   # [B] lengths BEFORE this token
    cfg: LlamaConfig,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    k_scales: Optional[List[jnp.ndarray]] = None,  # per-layer, quantized
    v_scales: Optional[List[jnp.ndarray]] = None,
    mesh=None,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """One decode step: appends this token's K/V to the paged cache and
    attends over it with the paged kernel.  Returns
    (logits [B, V], k_pages, v_pages, new_context_lens) — plus
    (k_scales, v_scales) appended to the tuple when quantized pools are
    passed.

    With `mesh`, the append+attend runs as a shard_map island with KV
    heads (and their GQA q-head groups) sharded over `model_axis` —
    single-replica tensor-parallel serving.  Pools must be head-sharded
    ([Hkv, ...] with Hkv % tp == 0); block tables / lens replicate.
    Serving data parallelism is engine-replica-level by design (each
    replica owns its own pool), so no batch axis here."""
    quantized = k_scales is not None

    # decode windows are trailing-W (k >= pos-W+1) while prefill's mask is
    # q-k <= W (k >= pos-W): W+1 on the decode side makes them identical
    dec_window = cfg.window_size + 1 if cfg.window_size > 0 else -1

    def _attend_local(q, k, v, kp, vp, ks, vs, bt, lens):
        if quantized:
            kp, vp, ks, vs, lens_out = kv_cache_append_decode_quantized(
                kp, vp, ks, vs, k, v, bt, lens)
            attn = paged_attention(q, kp, vp, bt, lens_out,
                                   k_scales=ks, v_scales=vs,
                                   window_size=dec_window)
        else:
            kp, vp, lens_out = kv_cache_append_decode(kp, vp, k, v, bt, lens)
            attn = paged_attention(q, kp, vp, bt, lens_out,
                                   window_size=dec_window)
            ks = vs = jnp.zeros((), jnp.float32)
        return attn, kp, vp, ks, vs, lens_out

    if mesh is not None:
        hspec = P(None, model_axis, None)
        pool_spec = P(model_axis, None, None, None)
        scale_spec = P(model_axis, None, None) if quantized else P()
        attend = shard_map(
            _attend_local, mesh=mesh,
            in_specs=(hspec, hspec, hspec, pool_spec, pool_spec,
                      scale_spec, scale_spec, P(None, None), P(None)),
            out_specs=(hspec, pool_spec, pool_spec, scale_spec,
                       scale_spec, P(None)),
            check_vma=False,
        )
    else:
        attend = _attend_local
    x = params["embed"][token]  # [B, dim]
    new_k_pages, new_v_pages = [], []
    new_k_scales, new_v_scales = [], []
    lens_out = context_lens
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q = (h @ layer["wq"]).reshape(-1, cfg.n_heads, cfg.head_dim)
        k = (h @ layer["wk"]).reshape(-1, cfg.n_kv_heads, cfg.head_dim)
        v = (h @ layer["wv"]).reshape(-1, cfg.n_kv_heads, cfg.head_dim)
        # rotate by absolute position ([B, H, D] -> per-batch table rows)
        c = rope_cos[positions][:, None, :]
        sn = rope_sin[positions][:, None, :]
        half = cfg.head_dim // 2
        q = jnp.concatenate(
            [q[..., :half] * c - q[..., half:] * sn,
             q[..., :half] * sn + q[..., half:] * c], axis=-1).astype(q.dtype)
        k = jnp.concatenate(
            [k[..., :half] * c - k[..., half:] * sn,
             k[..., :half] * sn + k[..., half:] * c], axis=-1).astype(k.dtype)

        ksi = k_scales[li] if quantized else jnp.zeros((), jnp.float32)
        vsi = v_scales[li] if quantized else jnp.zeros((), jnp.float32)
        attn, kp, vp, ks, vs, lens_out = attend(
            q, k, v, k_pages[li], v_pages[li], ksi, vsi,
            block_tables, context_lens)
        if quantized:
            new_k_scales.append(ks)
            new_v_scales.append(vs)
        new_k_pages.append(kp)
        new_v_pages.append(vp)
        x = x + attn.reshape(-1, cfg.n_heads * cfg.head_dim) @ layer["wo"]

        h = rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        gate = jax.nn.silu((h @ layer["w_gate"]).astype(jnp.float32))
        x = x + ((gate * (h @ layer["w_up"]).astype(jnp.float32)).astype(
            x.dtype) @ layer["w_down"])

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    if quantized:
        return (logits, new_k_pages, new_v_pages, lens_out,
                new_k_scales, new_v_scales)
    return logits, new_k_pages, new_v_pages, lens_out


def loss_fn(params, tokens, cfg: LlamaConfig, mesh=None):
    """Next-token cross-entropy (training objective for the train step)."""
    logits = forward(params, tokens[:, :-1], cfg, mesh=mesh)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)


def train_step(params, tokens, cfg: LlamaConfig, lr: float = 1e-4,
               mesh=None):
    """One SGD step; jit this over a mesh for multi-chip dp+tp training."""
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg, mesh)
    params = jax.tree.map(
        lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype)
        if p.dtype != jnp.float32 else p - lr * g.astype(jnp.float32),
        params, grads)
    return params, loss


def decode_step_fused(
    params: Dict[str, Any],
    token: jnp.ndarray,            # [B] int32
    positions: jnp.ndarray,        # [B] int32
    kv_pages: List[jnp.ndarray],   # per-layer fused pools [P,2,Hkv,page,D]
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    cfg: LlamaConfig,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    kv_scales: Optional[List[jnp.ndarray]] = None,
    mesh=None,
    model_axis: str = "model",
    lora=None,
    lora_idx: Optional[jnp.ndarray] = None,
):
    """decode_step over fused-layout pools (ops/paged_fused.py) — the
    serving fast path: one DMA per page spanning K+V and all kv heads.
    Quantizes appended tokens when scale pools are passed.

    With `mesh`, the append+attend is a shard_map island with KV heads
    (and their GQA q-head groups) sharded over `model_axis`: each shard
    owns a fused pool slice [P, 2, Hkv/tp, page, D] whose pages are fully
    local, so the kernel runs unchanged per shard — tensor-parallel
    serving stays on the fused fast path (r1 required the 7.6x-slower
    split layout).  Quantized scale pools carry tp*128 lanes (see
    ops/paged_fused.fused_scales_shape)."""
    from ..ops.paged_fused import (
        kv_cache_append_decode_fused,
        paged_attention_fused,
    )

    quantized = kv_scales is not None
    # see decode_step: +1 aligns the decode kernels' trailing-W window
    # with the prefill mask's q-k <= W
    dec_window = cfg.window_size + 1 if cfg.window_size > 0 else -1

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
        ll = _lora_at(lora, li)
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q = _lora_proj(h, layer["wq"], ll, "wq", lora_idx).reshape(
            -1, cfg.n_heads, cfg.head_dim)
        k = _lora_proj(h, layer["wk"], ll, "wk", lora_idx).reshape(
            -1, cfg.n_kv_heads, cfg.head_dim)
        v = _lora_proj(h, layer["wv"], ll, "wv", lora_idx).reshape(
            -1, cfg.n_kv_heads, cfg.head_dim)
        q = jnp.concatenate(
            [q[..., :half] * c - q[..., half:] * sn,
             q[..., :half] * sn + q[..., half:] * c], axis=-1).astype(q.dtype)
        k = jnp.concatenate(
            [k[..., :half] * c - k[..., half:] * sn,
             k[..., :half] * sn + k[..., half:] * c], axis=-1).astype(k.dtype)

        sci = (kv_scales[li] if quantized
               else jnp.zeros((), jnp.float32))
        attn, kv, sc, lens_out = attend(
            q, k, v, kv_pages[li], sci, block_tables, context_lens)
        if quantized:
            new_sc.append(sc)
        new_kv.append(kv)
        x = x + _lora_proj(attn.reshape(-1, cfg.n_heads * cfg.head_dim),
                           layer["wo"], ll, "wo", lora_idx)

        h = rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        gate = jax.nn.silu((h @ layer["w_gate"]).astype(jnp.float32))
        x = x + ((gate * (h @ layer["w_up"]).astype(jnp.float32)).astype(
            x.dtype) @ layer["w_down"])

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    if quantized:
        return logits, new_kv, lens_out, new_sc
    return logits, new_kv, lens_out


def prefill_step_fused(
    params: Dict[str, Any],
    tokens: jnp.ndarray,           # [B, S_chunk] int32 (padded chunks)
    q_offsets: jnp.ndarray,        # [B] absolute position of tokens[:, 0]
    seq_lens: jnp.ndarray,         # [B] valid tokens in this chunk
    kv_pages: List[jnp.ndarray],   # per-layer fused pools
    block_tables: jnp.ndarray,
    cfg: LlamaConfig,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    kv_scales: Optional[List[jnp.ndarray]] = None,
    mesh=None,
    model_axis: str = "model",
    all_logits: bool = False,
    lora=None,
    lora_idx: Optional[jnp.ndarray] = None,
):
    """One CHUNKED-prefill step over fused pools: append the chunk's KV,
    then attend to cache history + chunk via ops/paged_fused.py's
    paged_attention_prefill.  Returns (last_logits [B, V], pools,
    new_lens[, scales]) — logits are for each sequence's LAST valid
    chunk token (the only row serving ever samples).

    all_logits=True returns logits for EVERY chunk position [B, S, V]
    instead — speculative-decode verification needs the target's
    next-token distribution after each drafted token in one pass.

    With `mesh`, append+attend shard their head dims over `model_axis`
    (see decode_step_fused).
    """
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
                q, kvp, bt, lens_out, q_offsets=qoff,
                causal=True, window_size=cfg.window_size, kv_scales=sc)
        else:
            kvp, lens_out = kv_cache_append_prefill_fused(
                kvp, k, v, bt, qoff, slens)
            attn = paged_attention_prefill(
                q, kvp, bt, lens_out, q_offsets=qoff,
                causal=True, window_size=cfg.window_size)
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
        ll = _lora_at(lora, li)
        h = rms_norm(x, layer["attn_norm"], cfg.norm_eps)
        q = _split_heads(_lora_proj(h, layer["wq"], ll, "wq", lora_idx),
                         cfg.n_heads, cfg.head_dim)
        k = _split_heads(_lora_proj(h, layer["wk"], ll, "wk", lora_idx),
                         cfg.n_kv_heads, cfg.head_dim)
        v = _split_heads(_lora_proj(h, layer["wv"], ll, "wv", lora_idx),
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
        x = x + _lora_proj(_merge_heads(attn), layer["wo"], ll, "wo",
                           lora_idx)

        h = rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
        gate = jax.nn.silu((h @ layer["w_gate"]).astype(jnp.float32))
        x = x + ((gate * (h @ layer["w_up"]).astype(jnp.float32)).astype(
            x.dtype) @ layer["w_down"])

    if all_logits:
        xn = rms_norm(x, params["final_norm"], cfg.norm_eps)
        logits = (xn @ params["lm_head"]).astype(jnp.float32)  # [B, S, V]
    else:
        # only the last valid row of each sequence is ever sampled
        last = jnp.take_along_axis(
            x, jnp.maximum(seq_lens - 1, 0)[:, None, None], axis=1)[:, 0]
        last = rms_norm(last, params["final_norm"], cfg.norm_eps)
        logits = (last @ params["lm_head"]).astype(jnp.float32)
    if quantized:
        return logits, new_kv, lens_out, new_sc
    return logits, new_kv, lens_out
