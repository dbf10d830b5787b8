"""Device mesh / sharding helpers."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_name: str = "data", n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(mesh: Mesh):
    """Sharding that replicates a pytree across the mesh."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis_name: str = "data"):
    """Sharding that splits the leading axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad an array's axis up to a multiple (frames must divide the mesh)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, n
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, target - n)
    return jnp.pad(x, pad_widths, mode="edge"), n
