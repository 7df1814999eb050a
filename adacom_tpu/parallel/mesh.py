"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEG_AXIS = "d"  # segment/data-parallel axis


def make_mesh(n_devices: Optional[int] = None, axis: str = SEG_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (axis,))


def shard_leading(mesh: Mesh, arr, axis: str = SEG_AXIS):
    """Place an array with its leading dim sharded over `axis`."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
