"""Pipeline parallelism: layers sharded over a `pipe` mesh axis.

Net-new vs the reference (single-device, SURVEY.md §2.4) and the third
classic parallelism axis next to data (batch) and tensor (heads): the
transformer's LAYER dim shards over `pipe`, activations flow stage to
stage over ICI via `jax.lax.ppermute`, and a GPipe-style schedule keeps
every stage busy with `M` microbatches (bubble fraction =
(P-1)/(M+P-1)).  Built on shard_map like the rest of parallel/ — XLA
sees P per-stage programs exchanging one [mb, S, D] activation per tick.

Autodiff gives the backward schedule for free: jax.grad through the
scan + ppermute runs the reverse pipeline (cotangents ppermute backwards
through the transposed collective), so `make_pipeline_train_step` is a
real pp training step, not a forward-only demo.

Layer-stacked parameters: `stack_layer_params` converts models/llama.py
per-layer lists into [n_layers, ...] pytrees whose leading dim shards
over `pipe`; each stage scans its LOCAL layers with lax.scan (one
compiled block body per stage, not L copies).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import llama

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def stack_layer_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """models/llama.py params -> same dict with `layers` as a single
    pytree of [n_layers, ...] arrays (stackable => pipeline-shardable)."""
    layers = params["layers"]
    stacked = {k: jnp.stack([lay[k] for lay in layers])
               for k in layers[0]}
    out = dict(params)
    out["layers"] = stacked
    return out


def unstack_layer_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of stack_layer_params."""
    stacked = params["layers"]
    n = next(iter(stacked.values())).shape[0]
    out = dict(params)
    out["layers"] = [{k: v[i] for k, v in stacked.items()}
                     for i in range(n)]
    return out


def pipeline_param_specs(pipe_axis: str = "pipe") -> Dict[str, Any]:
    """PartitionSpecs for stacked params: layer dim on `pipe`; embeddings
    and head replicated (stage 0 / stage P-1 use them; replication keeps
    the schedule free of extra collectives)."""
    layer = {k: P(pipe_axis, *([None] * nd)) for k, nd in [
        ("wq", 2), ("wk", 2), ("wv", 2), ("wo", 2),
        ("w_gate", 2), ("w_up", 2), ("w_down", 2),
        ("attn_norm", 1), ("mlp_norm", 1),
    ]}
    return {
        "embed": P(None, None),
        "layers": layer,
        "final_norm": P(None),
        "lm_head": P(None, None),
    }


def _block(layer, x, cfg, rope_cos, rope_sin):
    """One transformer block on [mb, S, dim] (mirrors llama.forward)."""
    h = llama.rms_norm(x, layer["attn_norm"], cfg.norm_eps)
    q = llama._split_heads(h @ layer["wq"], cfg.n_heads, cfg.head_dim)
    k = llama._split_heads(h @ layer["wk"], cfg.n_kv_heads, cfg.head_dim)
    v = llama._split_heads(h @ layer["wv"], cfg.n_kv_heads, cfg.head_dim)
    from ..ops.rope import apply_rope

    q = apply_rope(q, rope_cos, rope_sin)
    k = apply_rope(k, rope_cos, rope_sin)
    from ..ops.flash_vjp import flash_attention_vjp

    attn = flash_attention_vjp(q, k, v, causal=True,
                               window_size=cfg.window_size)
    x = x + llama._merge_heads(attn) @ layer["wo"]
    h = llama.rms_norm(x, layer["mlp_norm"], cfg.norm_eps)
    gate = jax.nn.silu((h @ layer["w_gate"]).astype(jnp.float32))
    x = x + ((gate * (h @ layer["w_up"]).astype(jnp.float32)).astype(
        x.dtype) @ layer["w_down"])
    return x


def make_pipeline_forward(
    mesh: Mesh,
    cfg: llama.LlamaConfig,
    *,
    microbatches: int,
    pipe_axis: str = "pipe",
):
    """Pipelined causal-LM forward: (stacked_params, tokens [B, S]) ->
    logits [B, S, V].  B must divide into `microbatches`; layers must
    divide the pipe axis size.  Differentiable (use it inside a loss)."""
    n_pipe = int(mesh.shape[pipe_axis])
    if cfg.n_layers % n_pipe:
        raise ValueError(f"n_layers {cfg.n_layers} % pipe {n_pipe} != 0")

    def local_fn(params, tokens, rope_cos, rope_sin):
        stage = jax.lax.axis_index(pipe_axis)
        layers = params["layers"]  # local [L/P, ...]
        mb, s = tokens.shape[1], tokens.shape[2]
        m = tokens.shape[0]

        def run_stage(x):
            def body(x, layer):
                return _block(layer, x, cfg, rope_cos, rope_sin), None
            x, _ = jax.lax.scan(body, x, layers)
            return x

        # GPipe schedule over T = M + P - 1 ticks.  `buf` holds each
        # stage's in-flight activation; stage 0 injects microbatch t,
        # the last stage's outputs collect into `outs`.
        embeds = params["embed"][tokens]  # [M, mb, S, dim]
        x0 = jnp.zeros_like(embeds[0])
        outs0 = jnp.zeros((m, mb, s, cfg.dim), embeds.dtype)
        perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]

        def tick(carry, t):
            x, outs = carry
            inject = jnp.where(t < m, t, 0)
            x = jnp.where(stage == 0, embeds[inject], x)
            y = run_stage(x)
            # last stage completes microbatch t - (P-1)
            done = t - (n_pipe - 1)
            take = jnp.logical_and(stage == n_pipe - 1, done >= 0)
            slot = jnp.where(done >= 0, done, 0)
            outs = jnp.where(
                take,
                jax.lax.dynamic_update_index_in_dim(outs, y, slot, 0),
                outs)
            x = jax.lax.ppermute(y, pipe_axis, perm)
            return (x, outs), None

        (x, outs), _ = jax.lax.scan(
            tick, (x0, outs0),
            jnp.arange(m + n_pipe - 1, dtype=jnp.int32))
        # every stage returns `outs`; only the last stage's is real —
        # broadcast it (outs is replicated-OUT so psum the one real copy)
        outs = jax.lax.psum(
            jnp.where(stage == n_pipe - 1, outs, jnp.zeros_like(outs)),
            pipe_axis)
        h = llama.rms_norm(outs, params["final_norm"], cfg.norm_eps)
        return (h @ params["lm_head"]).astype(jnp.float32)

    param_specs = pipeline_param_specs(pipe_axis)

    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(param_specs, P(None, None, None), P(None, None),
                  P(None, None)),
        out_specs=P(None, None, None, None),
        check_vma=False,
    )

    def fn(stacked_params, tokens):
        from ..ops.rope import precompute_rope_frequencies

        b, s = tokens.shape
        if b % microbatches:
            raise ValueError(f"batch {b} % microbatches {microbatches}")
        mb = b // microbatches
        rope_cos, rope_sin = precompute_rope_frequencies(
            s, cfg.head_dim, cfg.rope_base)
        toks = tokens.reshape(microbatches, mb, s)
        logits = sharded(stacked_params, toks, rope_cos, rope_sin)
        return logits.reshape(b, s, cfg.vocab_size)

    return fn


def make_pipeline_train_step(
    mesh: Mesh,
    cfg: llama.LlamaConfig,
    *,
    microbatches: int,
    lr: float = 1e-4,
    pipe_axis: str = "pipe",
):
    """Pipelined SGD step on stacked params: jax.grad runs the reverse
    pipeline schedule through the scan/ppermute transpose."""
    fwd = make_pipeline_forward(mesh, cfg, microbatches=microbatches,
                                pipe_axis=pipe_axis)

    def loss_fn(stacked_params, tokens):
        logits = fwd(stacked_params, tokens[:, :-1])
        targets = tokens[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
        return jnp.mean(nll)

    @jax.jit
    def step(stacked_params, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(stacked_params, tokens)
        new = jax.tree.map(
            lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype),
            stacked_params, grads)
        return new, loss

    return step
