"""Checkpoint / resume for params and serving state.

The reference has no checkpointing at all (SURVEY.md §5 — even its KV cache
is freed per call).  A serving/training framework needs one: pytrees are
saved as a flat .npz plus a structure descriptor, restoring onto any device
layout (re-sharding happens at device_put time).

npz cannot represent the ML dtypes (bfloat16, float8_*) — numpy would
silently degrade them to void ("|V2") records — so those leaves are
stored as raw same-width uints with the logical dtype recorded in the
sidecar json and view-cast back on load (bit-exact round trip).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import ml_dtypes
import numpy as np

# ML dtypes npz can't hold -> the raw uint view they serialize as
_VIEW_AS = {
    "bfloat16": np.uint16,
    "float8_e4m3fn": np.uint8,
    "float8_e5m2": np.uint8,
    "float8_e4m3": np.uint8,
    "float8_e4m3b11_fnuz": np.uint8,
    "float8_e5m2fnuz": np.uint8,
}


def save_pytree(path: str, tree: Any) -> None:
    """Save an arbitrary pytree of arrays to `path` (.npz + .tree.json)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays, dtypes = {}, []
    for i, x in enumerate(leaves):
        a = np.asarray(x)
        dtypes.append(str(a.dtype))
        if str(a.dtype) in _VIEW_AS:
            a = a.view(_VIEW_AS[str(a.dtype)])
        arrays[f"leaf_{i}"] = a
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    with open(_tree_path(path), "w") as f:
        json.dump({"treedef": str(treedef), "num_leaves": len(leaves),
                   "dtypes": dtypes}, f)
    # treedef string is informational; reconstruction uses a template tree


def load_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_pytree using `template` for structure
    (values ignored, dtypes preserved from disk)."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves = [npz[f"leaf_{i}"] for i in range(len(npz.files))]
    try:
        with open(_tree_path(path)) as f:
            dtypes = json.load(f).get("dtypes")
    except FileNotFoundError:  # pragma: no cover - legacy checkpoints
        dtypes = None
    if dtypes is not None:
        leaves = [a.view(np.dtype(getattr(ml_dtypes, dt)))
                  if dt in _VIEW_AS else a
                  for a, dt in zip(leaves, dtypes)]
    elif any(a.dtype.kind == "V" for a in leaves):
        raise ValueError(
            f"{path}: legacy checkpoint (no dtypes sidecar) contains "
            f"void-dtype leaves — it was written with bfloat16/float8 "
            f"arrays by a save_pytree that degraded them; the original "
            f"dtype is unrecoverable, re-save from the source arrays")
    t_leaves, treedef = jax.tree.flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template has "
            f"{len(t_leaves)}")
    return jax.tree.unflatten(treedef, leaves)


def _tree_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".tree.json"
