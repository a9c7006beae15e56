"""Sharded optimization: AdamW with ZeRO-1 optimizer-state partitioning.

Net-new vs the reference (a single-device kernel library with no
training loop; SURVEY.md §2.4).  The TPU-native form of ZeRO-1 is pure
sharding annotation — no hand-written state partitioning or NCCL
choreography:

  * params keep their tensor-parallel specs (replicated over `data`);
  * the f32 Adam moments (2x params bytes — the dominant training
    memory after activations) additionally shard their first free,
    dp-divisible dimension over the `data` axis;
  * `with_sharding_constraint` inside the jitted step pins both, and
    GSPMD inserts exactly the ZeRO-1 collective pattern: gradients
    reduce-scatter into the moment shards, updated params all-gather
    back to replicated.

Per-chip optimizer memory drops ~dp-fold; step math is bit-identical
to unsharded AdamW (element-wise ops are sharding-oblivious).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamWState:
    count: jnp.ndarray   # scalar int32
    mu: Any              # f32 pytree, params-shaped (ZeRO-1 sharded)
    nu: Any              # f32 pytree, params-shaped (ZeRO-1 sharded)
    # mixed precision: f32 master copy of the params (ZeRO-sharded);
    # None when the params train in f32 directly
    master: Any = None


def zero1_specs(param_specs, params, mesh: Mesh, data_axis: str = "data"):
    """Moment specs: the param's spec plus a `data_axis` partition on
    its first unsharded, dp-divisible dimension (none qualifying ->
    the moment stays replicated like the param)."""
    dp = mesh.shape[data_axis] if data_axis in mesh.shape else 1

    def one(spec, p):
        parts = list(tuple(spec) + (None,) * (p.ndim - len(tuple(spec))))
        if dp > 1:
            for i, d in enumerate(p.shape):
                if parts[i] is None and d % dp == 0:
                    parts[i] = data_axis
                    break
        return P(*parts)

    return jax.tree.map(one, param_specs, params,
                        is_leaf=lambda x: isinstance(x, P))


def adamw_init(params, param_specs=None, mesh: Optional[Mesh] = None,
               data_axis: str = "data",
               master_weights: bool = False) -> AdamWState:
    """Zero moments (f32).  With `mesh`+`param_specs`, moments are laid
    out ZeRO-1-sharded from the start (no replicated spike).

    master_weights=True keeps an f32 master copy of the params in the
    state (ZeRO-sharded like the moments): the update applies to the
    master and the low-precision params are re-derived each step, so
    sub-lsb bf16 updates accumulate instead of vanishing."""
    zeros = jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params)
    master = (jax.tree.map(lambda p: p.astype(jnp.float32), params)
              if master_weights else None)
    if mesh is not None and param_specs is not None:
        specs = zero1_specs(param_specs, params, mesh, data_axis)
        put = lambda z, s: jax.device_put(z, NamedSharding(mesh, s))
        zeros = jax.tree.map(put, zeros, specs,
                             is_leaf=lambda x: isinstance(x, P))
        if master is not None:
            master = jax.tree.map(put, master, specs,
                                  is_leaf=lambda x: isinstance(x, P))
    return AdamWState(count=jnp.zeros((), jnp.int32), mu=zeros,
                      nu=jax.tree.map(lambda z: z, zeros),
                      master=master)


def global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in jax.tree.leaves(tree)))


def make_adamw_train_step(model, cfg, mesh: Optional[Mesh] = None,
                          *, lr=1e-4, b1: float = 0.9,
                          b2: float = 0.999, eps: float = 1e-8,
                          weight_decay: float = 0.0,
                          clip_norm: float = 0.0,
                          micro_batches: int = 1,
                          data_axis: str = "data"):
    """jit'd (params, opt_state, tokens) -> (params, opt_state, loss).

    `model` is a family module exposing loss_fn(params, tokens, cfg,
    mesh) and param_specs(cfg) (models/llama.py interface).  Without a
    mesh this is plain single-device AdamW; with one, params pin to
    their TP specs and moments to ZeRO-1 specs.

    lr: float or callable(step_count int32) -> f32 (schedules run
    in-jit, e.g. lambda t: peak * jnp.minimum(1.0, t / warmup)).
    clip_norm > 0 applies global-norm gradient clipping.
    micro_batches=N accumulates grads over N sequential microbatches
    (tokens' batch dim must divide N) before the single update —
    activation memory scales with batch/N while the update sees the
    full-batch gradient."""
    p_specs = model.param_specs(cfg) if mesh is not None else None

    def constrain(tree, specs):
        if mesh is None:
            return tree
        return jax.tree.map(
            lambda x, s: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, s)),
            tree, specs, is_leaf=lambda x: isinstance(x, P))

    def step(params, opt: AdamWState, tokens):
        if micro_batches > 1:
            b = tokens.shape[0]
            assert b % micro_batches == 0, (b, micro_batches)
            micro = tokens.reshape(micro_batches, b // micro_batches,
                                   *tokens.shape[1:])

            def acc(carry, mb):
                loss_sum, g_sum = carry
                loss, g = jax.value_and_grad(model.loss_fn)(
                    params, mb, cfg, mesh)
                g_sum = jax.tree.map(
                    lambda a, x: a + x.astype(jnp.float32), g_sum, g)
                return (loss_sum + loss, g_sum), None

            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)
            (loss, grads), _ = jax.lax.scan(
                acc, (jnp.float32(0.0), zeros), micro)
            loss = loss / micro_batches
            grads = jax.tree.map(lambda g: g / micro_batches, grads)
        else:
            loss, grads = jax.value_and_grad(model.loss_fn)(
                params, tokens, cfg, mesh)
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        if clip_norm > 0.0:
            scale = jnp.minimum(
                1.0, clip_norm / (global_norm(grads) + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        z_specs = (zero1_specs(p_specs, params, mesh, data_axis)
                   if mesh is not None else None)
        count = opt.count + 1
        lr_t = lr(count) if callable(lr) else lr
        # pinning mu/nu to the ZeRO-1 specs makes GSPMD reduce-scatter
        # the (param-spec'd) gradients into the moment shards
        mu = constrain(jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g, opt.mu, grads), z_specs)
        nu = constrain(jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * g * g, opt.nu, grads),
            z_specs)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(base, m, v):
            u = (m / c1) / (jnp.sqrt(v / c2) + eps)
            if weight_decay:
                u = u + weight_decay * base.astype(jnp.float32)
            return base.astype(jnp.float32) - lr_t * u

        if opt.master is not None:
            # mixed precision: update the f32 master (stays ZeRO-
            # sharded), re-derive the low-precision params from it
            master = constrain(
                jax.tree.map(upd, opt.master, mu, nu), z_specs)
            params = constrain(
                jax.tree.map(lambda mp, p: mp.astype(p.dtype),
                             master, params), p_specs)
            return params, AdamWState(count, mu, nu, master), loss
        # pinning params back to their (data-replicated) TP specs is
        # the ZeRO-1 all-gather of the sharded update
        params = constrain(
            jax.tree.map(lambda p, m, v: upd(p, m, v).astype(p.dtype),
                         params, mu, nu), p_specs)
        return params, AdamWState(count, mu, nu), loss

    return jax.jit(step)
