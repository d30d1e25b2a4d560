"""KZG polynomial commitments over the monomial SRS (commit = MSM on device).
(SURVEY.md section 2.2, "KZG commitment scheme".)
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

import jax

from ..ec import host as ech
from ..ff import field_jax as f
from ..msm.pippenger import msm_packed_multi
from .srs import SRS


def default_window_bits() -> int:
    """8-bit windows on TPU; tests override to 4 (smaller bucket folds) via
    PAILLIER_TPU_MSM_WINDOW."""
    return int(os.environ.get("PAILLIER_TPU_MSM_WINDOW", "8"))


def commit(srs: SRS, coeffs_mont: jnp.ndarray, window_bits: int | None = None) -> ech.Point:
    """Commit to a polynomial given in Montgomery coefficient form (D, m)."""
    if window_bits is None:
        window_bits = default_window_bits()
    return commit_many(srs, [coeffs_mont], window_bits)[0]


# SRS base points pre-encoded for the native CPU MSM backend, cached per SRS
# object (the encode walks every point once in Python; commits then slice the
# byte prefix for any m <= srs.n).
_NATIVE_SRS_CACHE: dict[int, tuple[bytes, bytes]] = {}


def _native_srs_bytes(srs: SRS) -> tuple[bytes, bytes]:
    ent = _NATIVE_SRS_CACHE.get(id(srs))
    if ent is None:
        from ..native import _enc_g1

        pts = srs.g1_points()
        pb, infs = bytearray(64 * len(pts)), bytearray(len(pts))
        for i, p in enumerate(pts):
            b, inf = _enc_g1(p)
            pb[64 * i : 64 * i + 64] = b
            infs[i] = inf
        ent = (bytes(pb), bytes(infs))
        _NATIVE_SRS_CACHE[id(srs)] = ent
    return ent


def _use_native_backend() -> bool:
    """CPU platform (tests, virtual meshes) routes commits through the native
    C++ Pippenger: the device MSM kernel is built for TPU and runs ~1000x
    slower through unfused XLA:CPU thunks. An ACTIVE proving mesh always wins
    over this fallback (checked in commit_many before this is consulted), so
    the distributed prover really runs the sharded MSM.
    PAILLIER_TPU_COMMIT_BACKEND overrides: 'device' forces the JAX path,
    'native' forces C++ (and disables even the mesh path)."""
    mode = os.environ.get("PAILLIER_TPU_COMMIT_BACKEND", "auto")
    if mode == "device":
        return False
    if mode == "native":
        return True
    return jax.devices()[0].platform == "cpu"


def _commit_many_native(srs: SRS, coeffs_list, m: int) -> list[ech.Point]:
    from ..native import g1_msm_raw

    pts_b, infs_b = _native_srs_bytes(srs)
    pts_b, infs_b = pts_b[: 64 * m], infs_b[:m]
    out = []
    for c in coeffs_list:
        digits = np.asarray(f.from_mont(f.FR, c), dtype=np.uint32)  # (32, m)
        sc = np.ascontiguousarray(digits.astype(np.uint8).T).tobytes()
        out.append(g1_msm_raw(pts_b, infs_b, sc, m))
    return out


def commit_many(srs: SRS, coeffs_list, window_bits: int | None = None) -> list[ech.Point]:
    """Commit a whole phase's polynomials in one batched MSM (equal widths
    required; pad shorter polys with zero coefficients first)."""
    if not coeffs_list:
        return []
    if window_bits is None:
        window_bits = default_window_bits()
    m = coeffs_list[0].shape[1]
    assert all(c.shape[1] == m for c in coeffs_list), "pad polys to equal width"
    assert m <= srs.n
    from ..poly import ops as _ops

    # An active proving mesh takes priority over the native-CPU fallback:
    # the distributed prover's commits must actually exercise the sharded
    # MSM (its collectives are the point of the dryrun / distributed tests).
    mesh = _ops._ACTIVE_MESH
    if (
        mesh is not None
        and mesh.devices.size > 1
        and m % mesh.devices.size == 0
        and os.environ.get("PAILLIER_TPU_COMMIT_BACKEND") != "native"
    ):
        from ..mesh.msm import msm_sharded_multi  # sharded bucket accumulation

        scalars = jnp.stack([f.from_mont(f.FR, c) for c in coeffs_list])
        return msm_sharded_multi(
            mesh,
            jnp.asarray(srs.g1_px[:, :m]),
            jnp.asarray(srs.g1_py[:, :m]),
            jnp.asarray(srs.g1_inf[:m]),
            scalars,
            window_bits=window_bits,
        )
    if _use_native_backend():
        return _commit_many_native(srs, coeffs_list, m)
    scalars = jnp.stack([f.from_mont(f.FR, c) for c in coeffs_list])
    px, py, pinf = _srs_bases_dev(srs, m)
    return msm_packed_multi(px, py, pinf, scalars, window_bits=window_bits)


def _srs_bases_dev(srs: SRS, m: int):
    """Device-resident SRS base slices, cached per (srs, m): jnp.asarray of a
    host array re-transfers on every call otherwise — at k=20 that is
    ~260 MB PER COMMIT PHASE over the tunnel."""
    cache = getattr(srs, "_dev_bases", None)
    if cache is None:
        cache = srs._dev_bases = {}
    ent = cache.get(m)
    if ent is None:
        ent = (
            jnp.asarray(srs.g1_px[:, :m]),
            jnp.asarray(srs.g1_py[:, :m]),
            jnp.asarray(srs.g1_inf[:m]),
        )
        cache[m] = ent
    return ent
