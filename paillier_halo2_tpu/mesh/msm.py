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


@functools.lru_cache(maxsize=64)
def _local_buckets_fn(mesh, axes, signed: bool, n_buckets: int,
                      subs_all: tuple, bcaps_all: tuple | None):
    """Cached shard_map program for the per-chip bucket accumulation.

    Defining the shard_map inside msm_sharded_multi made EVERY call re-trace
    and re-lower the whole n-device program (~36 s per call on the 8-thread
    virtual mesh — measured round 5; the r4 driver dryrun spent ~80% of its
    wall time here across ~20 commit calls). jax.jit caches by function
    identity, so the decorated callable must be built once per
    (mesh, schedule) and reused."""
    if not signed:

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(None, axes), P(None, axes), P(axes), P(None, axes)),
            out_specs=P(None, axes, None, None, None),
            check_vma=False,
        )
        def local_buckets(lpx, lpy, lpinf, lkeys):
            acc = pip._bucket_impl(
                lpx, lpy, lpinf, lkeys, None, n_buckets, subs_all, bcaps_all
            )
            return jnp.stack(acc)[:, None]  # (3, 1, 32, P*W, B) per device

        return jax.jit(local_buckets)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axes), P(None, axes), P(axes), P(None, axes), P(None, axes)),
        out_specs=P(None, axes, None, None, None),
        check_vma=False,
    )
    def local_buckets_signed(lpx, lpy, lpinf, lkeys, lnegs):
        acc = pip._bucket_impl(
            lpx, lpy, lpinf, lkeys, lnegs, n_buckets, subs_all, bcaps_all
        )
        return jnp.stack(acc)[:, None]

    return jax.jit(local_buckets_signed)


def msm_sharded_multi(
    mesh, px, py, p_inf, scalar_digits_multi, window_bits: int = 8
) -> list[ech.Point]:
    """Batched MSMs sharing one base set, the point axis sharded across
    `mesh`'s 'x' axis: scalar_digits_multi is (P, 32, N); returns P host
    affine results.

    Per chip: local Pippenger bucket accumulation with the poly axis folded
    into the window axis (identical SPMD program on the local shard; no
    communication). Cross-chip: the per-chip bucket sets are combined with a
    log-depth pairwise point-add tree — point addition is the reduction
    operator, so a plain psum cannot be used; the gather rides the mesh axis
    once (buckets are tiny next to the point set).
    """
    sd = jnp.asarray(scalar_digits_multi)
    assert sd.ndim == 3
    n = px.shape[1]
    d = mesh.devices.size
    assert n % d == 0, "pad point count to a multiple of the mesh size"
    axes = mesh.axis_names  # 1D ("x",) or 2D ("host", "chip")
    n_polys = sd.shape[0]

    # Signed/lazy bucket path on accelerators (round 4: previously the
    # entire round-3 MSM speedup — signed c-bit windows + lazy int16
    # accumulators — was single-chip only). Sized by the PER-CHIP point
    # count; CPU virtual meshes keep the canonical unsigned kernels.
    c_signed = pip._signed_window_bits(n // d)
    if c_signed is not None:
        n_windows = -(-256 // c_signed)
        n_buckets = (1 << (c_signed - 1)) + 1
        subs, bcaps = pip._sub_schedule_signed(n_windows, c_signed)
        keys, negs = pip._signed_keys_jit(c_signed)(sd)  # (P, W, N) x2
        keys = keys.reshape(n_polys * n_windows, -1)
        negs = negs.reshape(n_polys * n_windows, -1)
        shift = c_signed
    else:
        keys = jax.vmap(lambda s: pip._keys_from_digits(s, window_bits))(sd)
        n_windows = keys.shape[1]
        keys = keys.reshape(n_polys * n_windows, -1)
        negs = None
        n_buckets = 1 << window_bits
        subs = pip._sub_schedule(n_windows, window_bits)
        bcaps = None
        shift = window_bits
    subs_all = tuple(subs * n_polys)  # row = p*W + w
    bcaps_all = None if bcaps is None else tuple(bcaps * n_polys)

    fn = _local_buckets_fn(mesh, axes, negs is not None, n_buckets, subs_all, bcaps_all)
    if negs is None:
        stacked = fn(jnp.asarray(px), jnp.asarray(py), jnp.asarray(p_inf), keys)
    else:
        stacked = fn(jnp.asarray(px), jnp.asarray(py), jnp.asarray(p_inf), keys, negs)

    # stacked: (3, d, 32, P*W, B) — move digits first, then reduce the device
    # axes minor-to-major (chips within a host over ICI before hosts over
    # DCN) with log-depth pairwise point-add trees. Runs EAGERLY on purpose:
    # jitting this over the sharded `stacked` compiles a replicated
    # multi-device program that re-runs the whole tree on every device
    # thread (measured round 5: the jitted form timed out where the eager
    # form ran in seconds on the 8-thread virtual mesh).
    def _tree_reduce_axis(p, axis):
        m = p[0].shape[axis]
        if m > 1 and (m & (m - 1)) == 0:
            # power-of-two width: constant-shape roll-and-add fold — ONE
            # compiled padd instance for the whole log-depth tree (step i
            # only needs lanes < m >> (i+1) correct, so no masking). The
            # unrolled variant below emits log2(m) padd instances, each
            # ~35 s of XLA:CPU compile (see ec/slp.py).
            def fold(i, t):
                half = jnp.right_shift(jnp.int32(m), i + 1)
                shifted = tuple(jnp.roll(c, -half, axis=axis) for c in t)
                return bn254.padd(t, shifted)

            p = jax.lax.fori_loop(0, m.bit_length() - 1, fold, p)
            return tuple(
                jnp.take(c, jnp.arange(0, 1), axis=axis) for c in p
            )
        while p[0].shape[axis] > 1:
            m = p[0].shape[axis]
            half = m // 2
            sl = lambda lo, hi: tuple(
                jnp.take(c, jnp.arange(lo, hi), axis=axis) for c in p
            )
            s = bn254.padd(sl(0, half), sl(half, 2 * half))
            if m % 2:
                s = tuple(
                    jnp.concatenate([sc, jnp.take(c, jnp.arange(m - 1, m), axis=axis)], axis=axis)
                    for sc, c in zip(s, p)
                )
            p = s
        return p

    mesh_shape = mesh.devices.shape  # e.g. (8,) or (n_hosts, chips_per_host)
    p = tuple(
        jnp.moveaxis(stacked[i], 1, 0).reshape((32,) + mesh_shape + stacked.shape[3:])
        for i in range(3)
    )  # (32, *mesh_shape, PW, B)
    for axis in range(len(mesh_shape), 0, -1):  # minor (ICI) first
        p = _tree_reduce_axis(p, axis)
    buckets = tuple(c.reshape((32,) + stacked.shape[3:]) for c in p)
    tw = pip._window_sums(buckets, n_buckets)
    pts = bn254.unpack_jacobian(tw)  # (P*W) window sums, poly-major
    out = []
    for pi in range(n_polys):
        acc = None
        for pt in reversed(pts[pi * n_windows : (pi + 1) * n_windows]):
            for _ in range(shift):
                acc = ech.g1_double(acc)
            acc = ech.g1_add(acc, pt)
        out.append(acc)
    return out


def msm_sharded(mesh, px, py, p_inf, scalar_digits, window_bits: int = 8) -> ech.Point:
    """Single sharded MSM (see msm_sharded_multi)."""
    return msm_sharded_multi(
        mesh, px, py, p_inf, jnp.asarray(scalar_digits)[None], window_bits
    )[0]
