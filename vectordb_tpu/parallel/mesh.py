"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("shard",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """A mesh over the first ``n_devices`` devices.

    With one axis name the mesh is 1-D over all requested devices; pass
    ``shape`` for multi-axis meshes (e.g. shape=(4, 2),
    axis_names=("rows", "batch")).
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present")
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != device count {len(devices)}")
    if len(shape) != len(axis_names):
        raise ValueError("axis_names must match mesh shape rank")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


__all__ = ["make_mesh"]
