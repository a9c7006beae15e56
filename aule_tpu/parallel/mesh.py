"""Mesh construction helpers.

The reference is single-device (SURVEY.md §2.4); on TPU the mesh is the
foundation of every scaling axis: `data` (batch / continuous-batching
across hosts), `model` (heads), `ctx` (KV sequence / pages).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Create a mesh over the available devices.

    Defaults: all devices on a 2-D (data, model) mesh with model = min(#kv
    heads-friendly power of two, device count) left to the caller; with no
    axis_sizes, puts everything on `data`.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(
            f"axis sizes {axis_sizes} do not multiply to device count {n}")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def single_axis_mesh(name: str = "x", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=(name,))
