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


def make_mesh_2d(n_hosts: int, chips_per_host: int | None = None) -> Mesh:
    """(host, chip) mesh for the multi-host configs (BASELINE config 5).

    On a real pod slice the 'chip' axis rides ICI within a host and the
    'host' axis rides DCN, so collectives should reduce over 'chip' first
    (jax orders mesh axes major-to-minor; contiguous device blocks land on
    one host). On the virtual CPU mesh the same program validates the
    communication structure without the hardware.
    """
    devs = jax.devices()
    cph = chips_per_host or (len(devs) // n_hosts)
    need = n_hosts * cph
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    return Mesh(np.array(devs[:need]).reshape(n_hosts, cph), ("host", "chip"))
