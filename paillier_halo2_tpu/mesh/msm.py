"""Multi-chip MSM: bases and scalars row-sharded per chip, per-chip bucket
accumulation, bucket sets combined across chips, then one window-sum fold
(SURVEY.md section 2.3, "sharded MSM"). Collectives ride the mesh axis (ICI
on real hardware); the same program runs on the virtual CPU mesh in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ec import bn254
from ..ec import host as ech
from ..msm import pippenger as pip


def msm_sharded(mesh, px, py, p_inf, scalar_digits, window_bits: int = 8) -> ech.Point:
    """MSM with the point axis sharded across `mesh`'s 'x' axis.

    Per chip: local Pippenger bucket accumulation (identical SPMD program on
    the local shard; no communication). Cross-chip: the per-chip bucket sets
    are combined with a log-depth pairwise point-add tree — point addition is
    the reduction operator, so a plain psum cannot be used; the gather rides
    the mesh axis once (buckets are tiny next to the point set).
    """
    n = px.shape[1]
    d = mesh.devices.size
    assert n % d == 0, "pad point count to a multiple of the mesh size"
    keys = pip._keys_from_digits(jnp.asarray(scalar_digits), window_bits)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, "x"), P(None, "x"), P("x"), P(None, "x")),
        out_specs=P(None, "x", None, None, None),
        check_vma=False,
    )
    def local_buckets(lpx, lpy, lpinf, lkeys):
        acc = pip._bucket_accumulate(lpx, lpy, lpinf, lkeys, window_bits)
        return jnp.stack(acc)[:, None]  # (3, 1, 32, W, B) per device

    stacked = local_buckets(jnp.asarray(px), jnp.asarray(py), jnp.asarray(p_inf), keys)
    # stacked: (3, d, 32, W, B) — move digits first, reduce the device axis.
    p = tuple(jnp.moveaxis(stacked[i], 1, 0) for i in range(3))  # (32, d, W, B)
    while p[0].shape[1] > 1:
        m = p[0].shape[1]
        half = m // 2
        a = tuple(c[:, :half] for c in p)
        b = tuple(c[:, half : 2 * half] for c in p)
        s = bn254.padd(a, b)
        if m % 2:
            s = tuple(jnp.concatenate([sc, c[:, -1:]], axis=1) for sc, c in zip(s, p))
        p = s
    buckets = tuple(c[:, 0] for c in p)
    tw = pip._window_sums(buckets, 1 << window_bits)
    pts = bn254.unpack_jacobian(tw)
    acc = None
    for pt in reversed(pts):
        for _ in range(window_bits):
            acc = ech.g1_double(acc)
        acc = ech.g1_add(acc, pt)
    return acc
