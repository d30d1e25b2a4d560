"""KZG polynomial commitments over the monomial SRS (commit = MSM on device).
(SURVEY.md section 2.2, "KZG commitment scheme".)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ec import host as ech
from ..ff import field_jax as f
from ..msm.pippenger import msm_packed
from .srs import SRS


def commit(srs: SRS, coeffs_mont: jnp.ndarray, window_bits: int = 8) -> ech.Point:
    """Commit to a polynomial given in Montgomery coefficient form (D, m)."""
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
