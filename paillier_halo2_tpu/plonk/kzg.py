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
from ..msm.pippenger import msm_packed, msm_packed_multi
from .srs import SRS


def default_window_bits() -> int:
    """8-bit windows on TPU; tests override to 4 (smaller bucket folds) via
    PAILLIER_TPU_MSM_WINDOW."""
    return int(os.environ.get("PAILLIER_TPU_MSM_WINDOW", "8"))


def commit(srs: SRS, coeffs_mont: jnp.ndarray, window_bits: int | None = None) -> ech.Point:
    """Commit to a polynomial given in Montgomery coefficient form (D, m)."""
    if window_bits is None:
        window_bits = default_window_bits()
    m = coeffs_mont.shape[1]
    assert m <= srs.n, f"polynomial degree {m} exceeds SRS size {srs.n}"
    scalars = f.from_mont(f.FR, coeffs_mont)  # standard-form digits
    return msm_packed(
        jnp.asarray(srs.g1_px[:, :m]),
        jnp.asarray(srs.g1_py[:, :m]),
        jnp.asarray(srs.g1_inf[:m]),
        scalars,
        window_bits=window_bits,
    )


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
    scalars = jnp.stack([f.from_mont(f.FR, c) for c in coeffs_list])
    return msm_packed_multi(
        jnp.asarray(srs.g1_px[:, :m]),
        jnp.asarray(srs.g1_py[:, :m]),
        jnp.asarray(srs.g1_inf[:m]),
        scalars,
        window_bits=window_bits,
    )
