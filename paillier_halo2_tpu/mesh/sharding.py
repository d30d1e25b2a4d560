"""Mesh construction + sharding helpers (SURVEY.md section 2.3: the SPMD mesh
runtime replacing the reference's rayon thread pool)."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, arr, axis_name: str = "x"):
    """Place a digits-first array with its trailing batch axis sharded."""
    spec = P(*([None] * (arr.ndim - 1) + [axis_name]))
    return jax.device_put(arr, NamedSharding(mesh, spec))
