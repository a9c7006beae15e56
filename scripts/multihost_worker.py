"""Worker for the multi-HOST (multi-process) dry run.

Each process owns 4 virtual CPU devices; jax.distributed stitches them
into one 8-device world.  The mesh's DATA axis spans the process (DCN)
boundary and the MODEL axis stays process-local (ICI) — the layout the
scaling guide prescribes (dp gradients tolerate DCN latency; tp
collectives must not cross hosts).  Runs one dp*tp training step of the
tiny Llama plus one engine-replica decode, then prints an OK marker the
parent greps for.

Usage: multihost_worker.py <process_id> <num_processes> <coordinator>
"""
import os
import sys

pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ.setdefault("AULE_TPU_INTERPRET", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

# the environment's TPU plugin force-registers itself and overrides
# JAX_PLATFORMS; pin via the config API (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=addr,
                           num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa

from aule_tpu.models import llama  # noqa: E402

devs = jax.devices()
assert len(devs) == 4 * nproc, (len(devs), nproc)
data_par, model_par = 2 * nproc, 2
mesh = Mesh(np.asarray(devs).reshape(data_par, model_par),
            axis_names=("data", "model"))

cfg = llama.LlamaConfig.tiny(
    n_heads=4, n_kv_heads=2, dim=128, hidden_dim=256, n_layers=2)
params_local = llama.init_params(cfg, jax.random.key(0))
specs = llama.param_specs(cfg)


def garray(x, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        x.shape, sh, lambda idx, x=x: np.asarray(x)[idx])


params = jax.tree.map(garray, params_local, specs,
                      is_leaf=lambda x: isinstance(x, P))
tokens_np = np.random.default_rng(0).integers(
    0, cfg.vocab_size, (2 * data_par, 64)).astype(np.int32)
tokens = garray(tokens_np, P("data", None))

step = jax.jit(lambda p, t: llama.train_step(p, t, cfg, lr=1e-3,
                                             mesh=mesh))
new_params, loss = step(params, tokens)
jax.block_until_ready(new_params)
loss_val = float(loss)
assert np.isfinite(loss_val), loss_val
print(f"MULTIHOST-OK process={pid}/{nproc} dp{data_par}xtp{model_par} "
      f"loss={loss_val:.4f}", flush=True)
