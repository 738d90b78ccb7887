"""Device mesh helpers for multi-chip / multi-host execution.

The MSM is data-parallel in the (base, scalar) pairs: points are sharded
along the batch axis of a 1D (or the 'points' axis of a 2D) mesh, each chip
runs the full local Pippenger pipeline, and only the tiny per-window partial
sums cross the interconnect (SURVEY.md §2.3). Multi-host runs use the same
mesh API over jax.distributed-initialized global devices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("shard",)
) -> Mesh:
    """1D mesh over the first n_devices (default: all) global devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if len(axis_names) == 1:
        return Mesh(devices[:n], axis_names)
    raise ValueError("use make_mesh_2d for multi-axis meshes")


def make_mesh_2d(shape, axis_names=("batch", "points")) -> Mesh:
    """2D mesh: data-parallel batch axis x point-sharding axis."""
    import numpy as np

    devices = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devices, axis_names)
