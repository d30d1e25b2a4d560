"""Device polynomial utilities for the prover: fast host<->device packing,
coefficient/evaluation conversions, coset extension, inner-product evaluation,
prefix products, batch inversion, synthetic division.

All polynomials are (N_DIGITS, n) uint32 digit arrays in Montgomery form,
digits-first layout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import field_jax as f
from ..ff import host
from ..ff.limbs import N_DIGITS
from .domain import Domain
from .ntt import ntt

SPEC = f.FR
P = host.FR_MOD


# -- fast packing ------------------------------------------------------------


def pack_values(vals) -> np.ndarray:
    """Object-int array/list -> (N_DIGITS, n) uint32 digits (standard form)."""
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype=np.uint8).reshape(-1, N_DIGITS).T.astype(np.uint32)


def unpack_values(arr) -> list[int]:
    """(N_DIGITS, n) digits -> list of ints."""
    a = np.asarray(arr).astype(np.uint8).T.tobytes()
    return [int.from_bytes(a[i * 32 : (i + 1) * 32], "little") for i in range(len(a) // 32)]


def to_device_mont(vals) -> jnp.ndarray:
    return f.to_mont(SPEC, jnp.asarray(pack_values(vals)))


def from_device_mont(arr) -> list[int]:
    return unpack_values(np.asarray(f.from_mont(SPEC, arr)))


# -- coefficient <-> evaluation ----------------------------------------------


def coeffs_of(values: jnp.ndarray, k: int) -> jnp.ndarray:
    """Evaluations over H (natural order) -> coefficients."""
    return ntt(values, k, inverse=True)


def values_of(coeffs: jnp.ndarray, k: int) -> jnp.ndarray:
    return ntt(coeffs, k)


@functools.lru_cache(maxsize=None)
def _coset_scale_digits(k: int, k_ext: int) -> np.ndarray:
    """Montgomery digits of g^i for i < 2^k (coset shift before extended NTT)."""
    g = host.FR_GENERATOR
    out, acc = [], 1
    for _ in range(1 << k):
        out.append(acc * f.FR.r_mod_p % P)
        acc = acc * g % P
    return pack_values(out)


@functools.partial(jax.jit, static_argnums=(1, 2))
def extended_coset_evals(coeffs: jnp.ndarray, k: int, k_ext: int) -> jnp.ndarray:
    """Evaluate a degree-<2^k polynomial on the extended coset g*H_ext."""
    scale = jnp.asarray(_coset_scale_digits(k, k_ext))
    scaled = f.mont_mul(SPEC, coeffs, scale)
    padded = jnp.zeros((N_DIGITS, 1 << k_ext), jnp.uint32).at[:, : 1 << k].set(scaled)
    return ntt(padded, k_ext)


@functools.partial(jax.jit, static_argnums=(1, 2))
def coeffs_from_extended(evals_ext: jnp.ndarray, k: int, k_ext: int) -> jnp.ndarray:
    """Inverse of extended_coset_evals: coset evals -> coefficients (len 2^k_ext)."""
    coeffs = ntt(evals_ext, k_ext, inverse=True)
    g_inv = pow(host.FR_GENERATOR, P - 2, P)
    out, acc = [], 1
    for _ in range(1 << k_ext):
        out.append(acc * f.FR.r_mod_p % P)
        acc = acc * g_inv % P
    scale = jnp.asarray(pack_values(out))
    return f.mont_mul(SPEC, coeffs, scale)


# -- evaluation at a point ---------------------------------------------------


@jax.jit
def _sum_reduce(arr: jnp.ndarray) -> jnp.ndarray:
    """Tree-sum along the batch axis (mod p): (D, n) -> (D, 1)."""
    n = arr.shape[1]
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            arr = jnp.pad(arr, ((0, 0), (0, pad)))
        arr = f.add(SPEC, arr[:, :half], arr[:, half:])
        n = half
    return arr


def eval_at(coeffs: jnp.ndarray, x: int) -> int:
    """f(x) for a host point x: device inner product with host powers of x."""
    n = coeffs.shape[1]
    powers, acc = [], 1
    for _ in range(n):
        powers.append(acc)
        acc = acc * x % P
    pw = to_device_mont(powers)
    terms = f.mont_mul(SPEC, coeffs, pw)
    return from_device_mont(_sum_reduce(terms))[0]


# -- scans -------------------------------------------------------------------


@jax.jit
def prefix_product(arr: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix product along batch axis (Montgomery form)."""
    return jax.lax.associative_scan(lambda a, b: f.mont_mul(SPEC, a, b), arr, axis=1)


@jax.jit
def batch_inverse(arr: jnp.ndarray) -> jnp.ndarray:
    """Elementwise inverse via Fermat (inputs must be nonzero, Montgomery)."""
    return f.mont_inv(SPEC, arr)


@functools.partial(jax.jit, static_argnums=())
def synthetic_divide(coeffs: jnp.ndarray, z_digits: jnp.ndarray) -> jnp.ndarray:
    """(f(X) - f(z)) / (X - z) given coefficient form; returns quotient coeffs
    (same length, top coefficient zero). q_i = c_{i+1} + z*q_{i+1}: a suffix
    linear recurrence, evaluated as a log-depth scan over affine maps
    (m, a) -> y = a + m*y composed right-to-left."""
    n = coeffs.shape[1]
    z = jnp.broadcast_to(z_digits.reshape(N_DIGITS, 1), (N_DIGITS, n))
    # elements i = 0..n-1 represent maps f_i(y) = c_{i+1} + z*y (c_n := 0)
    shifted = jnp.concatenate([coeffs[:, 1:], jnp.zeros((N_DIGITS, 1), jnp.uint32)], axis=1)

    def combine(left, right):
        # (F_left o F_right)(y) = a_l + m_l*(a_r + m_r*y); the reverse scan
        # then yields r_i = F_i o F_{i+1} o ... o F_{n-1}, and q_i = r_i(0).
        ml, al = left
        mr, ar = right
        return f.mont_mul(SPEC, ml, mr), f.add(SPEC, al, f.mont_mul(SPEC, ml, ar))

    _, q = jax.lax.associative_scan(combine, (z, shifted), axis=1, reverse=True)
    return q


def fr_digits_mont(x: int) -> jnp.ndarray:
    return jnp.asarray(pack_values([x * f.FR.r_mod_p % P]))[:, 0]
