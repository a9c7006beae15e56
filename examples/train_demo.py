"""Training walkthrough: dp x tp mesh, ZeRO-1 AdamW, mixed precision,
warmup schedule, grad accumulation, checkpoint round trip.

Runs on an 8-device virtual CPU mesh (or a real slice unchanged):

    python examples/train_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if os.environ.get("AULE_DEMO_TPU", "0") != "1":
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    os.environ.setdefault("AULE_TPU_INTERPRET", "1")

import jax

if os.environ.get("AULE_DEMO_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from aule_tpu.models import llama
from aule_tpu.parallel.mesh import make_mesh
from aule_tpu.parallel.optimizer import adamw_init, make_adamw_train_step
from aule_tpu.utils.checkpoint import load_pytree, save_pytree

cfg = llama.LlamaConfig.tiny(dtype=jnp.bfloat16)
mesh = make_mesh((4, 2), ("data", "model"))
specs = llama.param_specs(cfg)
params = jax.tree.map(
    lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
    llama.init_params(cfg, jax.random.key(0)), specs,
    is_leaf=lambda x: isinstance(x, P))
opt = adamw_init(params, specs, mesh, master_weights=True)
step = make_adamw_train_step(
    llama, cfg, mesh,
    lr=lambda t: 3e-3 * jnp.minimum(1.0, t.astype(jnp.float32) / 3),
    weight_decay=0.01, clip_norm=1.0, micro_batches=2)

rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 64)), jnp.int32)
tokens = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))

for i in range(6):
    params, opt, loss = step(params, opt, tokens)
    mu0 = jax.tree.leaves(opt.mu)[1]
    print(f"step {i}: loss {float(loss):.4f}  "
          f"(moment shard spec: {mu0.sharding.spec})")

save_pytree("/tmp/train_demo_ckpt", {"params": params, "opt": opt})
restored = jax.tree.map(
    jnp.asarray, load_pytree("/tmp/train_demo_ckpt",
                             {"params": params, "opt": opt}))
params2, opt2, loss2 = step(restored["params"], restored["opt"], tokens)
print(f"resumed step: loss {float(loss2):.4f} (checkpoint round trip OK)")
