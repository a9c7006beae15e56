"""Mesh/sharding layer: shard_map'd attention (head / context / ring /
Ulysses), cross-shard softmax combine, pipeline parallelism, and the
ZeRO-1 optimizer."""

from .collectives import (  # noqa: F401
    softmax_combine_allreduce,
    softmax_combine_pair,
)
from .mesh import make_mesh  # noqa: F401
from .optimizer import (  # noqa: F401
    AdamWState,
    adamw_init,
    make_adamw_train_step,
    zero1_specs,
)
from .sharded import (  # noqa: F401
    make_context_parallel_attention,
    make_head_parallel_attention,
    make_ring_attention,
    make_sharded_paged_attention,
    make_sharded_paged_attention_fused,
    make_ulysses_attention,
)

__all__ = [
    "softmax_combine_allreduce",
    "softmax_combine_pair",
    "make_mesh",
    "AdamWState",
    "adamw_init",
    "make_adamw_train_step",
    "zero1_specs",
    "make_context_parallel_attention",
    "make_head_parallel_attention",
    "make_ring_attention",
    "make_sharded_paged_attention",
    "make_sharded_paged_attention_fused",
    "make_ulysses_attention",
]
