"""Checkpoint / resume for params and serving state.

The reference has no checkpointing at all (SURVEY.md §5 — even its KV cache
is freed per call).  A serving/training framework needs one: pytrees are
saved as a flat .npz plus a structure descriptor, restoring onto any device
layout (re-sharding happens at device_put time).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save an arbitrary pytree of arrays to `path` (.npz + .tree.json)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    with open(_tree_path(path), "w") as f:
        json.dump({"treedef": str(treedef), "num_leaves": len(leaves)}, f)
    # treedef string is informational; reconstruction uses a template tree


def load_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_pytree using `template` for structure
    (values ignored, dtypes preserved from disk)."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves = [npz[f"leaf_{i}"] for i in range(len(npz.files))]
    t_leaves, treedef = jax.tree.flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(t_leaves)}")
    return jax.tree.unflatten(treedef, leaves)


def _tree_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".tree.json"
