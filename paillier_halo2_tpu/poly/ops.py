"""Device polynomial utilities for the prover: fast host<->device packing,
coefficient/evaluation conversions, coset extension, inner-product evaluation,
prefix products, batch inversion, synthetic division.

All polynomials are (N_DIGITS, n) uint32 digit arrays in Montgomery form,
digits-first layout.
"""
from __future__ import annotations

import functools
import os

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

# -- optional distributed execution -------------------------------------------
# When a mesh is active (plonk.distributed.proving_mesh), the NTT-shaped entry
# points below route through the four-step distributed NTT (all-to-all over the
# mesh) whenever the size supports it (d^2 | n); everything else stays local
# SPMD and lets XLA partition elementwise work.

_ACTIVE_MESH = None


class proving_mesh:
    """Context manager activating distributed NTT/MSM routing for the prover
    (SURVEY.md section 2.3). Usage: `with ops.proving_mesh(mesh): ...`."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVE_MESH
        self._prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._prev
        return False


def _mesh_for(n: int):
    """The active mesh, if the transform size can ride the four-step NTT."""
    m = _ACTIVE_MESH
    if m is None:
        return None
    d = m.devices.size
    return m if d > 1 and n % (d * d) == 0 else None


# -- fast packing ------------------------------------------------------------


def pack_values_u8(vals) -> np.ndarray:
    """Object-int array/list of any shape S -> (N_DIGITS, *S) uint8 digits
    (standard form, row-major batch order). The uint8 form is what h2d
    transfers ship (4x less tunnel traffic than uint32 lanes; the device
    widens in one cast).

    Deliberately single-process: an earlier revision forked worker processes
    for large inputs, but fork() after JAX initialization is unsupported (JAX
    is multithreaded; a child can inherit a held lock) and it deadlocked the
    round-2 driver bench. Serial int->bytes runs ~0.7-1 M vals/s — under a
    second for the reference bench geometry, ~10 s at the heavy k=20 batch —
    which is cheaper than any amount of fork risk. Values that fit in uint64
    (the vast majority: limbs and small witnesses) take a vectorized numpy
    path instead of per-int to_bytes."""
    arr = np.asarray(vals, dtype=object)
    flat = arr.reshape(-1)
    n = len(flat)
    # Fast path: every value < 2^63 converts losslessly through int64.
    try:
        small = flat.astype(np.int64)
    except (OverflowError, TypeError):
        small = None
    if small is not None and n and (small >= 0).all():
        u = small.astype(np.uint64)
        dig = np.zeros((N_DIGITS, n), dtype=np.uint8)
        for d in range(8):  # 8 bytes of a uint64
            dig[d] = ((u >> np.uint64(8 * d)) & np.uint64(0xFF)).astype(np.uint8)
        return dig.reshape((N_DIGITS,) + arr.shape)
    buf = b"".join(int(v).to_bytes(32, "little") for v in flat)
    dig = np.frombuffer(buf, dtype=np.uint8).reshape(-1, N_DIGITS).T
    return np.ascontiguousarray(dig).reshape((N_DIGITS,) + arr.shape)


def pack_values(vals) -> np.ndarray:
    """uint32-lane form of pack_values_u8 (device kernels compute in uint32)."""
    return pack_values_u8(vals).astype(np.uint32)


def unpack_values(arr) -> list[int]:
    """(N_DIGITS, ...) digits -> flat list of ints (row-major over batch)."""
    a = np.asarray(arr)
    a = a.reshape(N_DIGITS, -1).astype(np.uint8).T.tobytes()
    return [int.from_bytes(a[i * 32 : (i + 1) * 32], "little") for i in range(len(a) // 32)]


# host<->device transfer counters: the prover's transcript plumbing is the
# main per-proof dispatch-latency cost over the axon tunnel, so the sync
# count is a tracked metric (bench.py reports host_syncs_per_proof)
TRANSFER_COUNTS = {"h2d": 0, "d2h": 0}


def reset_transfer_counts() -> dict:
    prev = dict(TRANSFER_COUNTS)
    TRANSFER_COUNTS["h2d"] = TRANSFER_COUNTS["d2h"] = 0
    return prev


def to_device_mont(vals) -> jnp.ndarray:
    TRANSFER_COUNTS["h2d"] += 1
    # ship uint8 digits (32 B/value); widen to uint32 lanes on device
    return f.to_mont(SPEC, jnp.asarray(pack_values_u8(vals)).astype(jnp.uint32))


def from_device_mont(arr) -> list[int]:
    TRANSFER_COUNTS["d2h"] += 1
    return unpack_values(np.asarray(f.from_mont(SPEC, arr)))


# -- coefficient <-> evaluation ----------------------------------------------


def _use_native_ntt(x) -> bool:
    """On the CPU platform (tests, virtual meshes) the digit-vector NTT runs
    through unfused XLA thunks at ~1000x the cost of the native C++ path, so
    concrete-array transforms route to native/bn254.cpp. Tracers (calls from
    inside jit/shard_map) and real accelerators stay on the JAX path.
    PAILLIER_TPU_NTT_BACKEND=device|native overrides."""
    mode = os.environ.get("PAILLIER_TPU_NTT_BACKEND", "auto")
    if mode == "device":
        return False
    if isinstance(x, jax.core.Tracer):
        return False
    from ..native import lib

    if lib() is None:
        return False
    return mode == "native" or jax.devices()[0].platform == "cpu"


def _ntt_native(x, k: int, inverse: bool) -> jnp.ndarray:
    n = 1 << k
    arr = np.asarray(x)  # (N_DIGITS, *batch, n) uint32, 8-bit digits
    batch = arr.shape[1:-1]
    rows = np.ascontiguousarray(
        np.moveaxis(arr.reshape(N_DIGITS, -1, n), 0, -1).astype(np.uint8)
    )  # (B, n, 32)
    from .. import native

    native.fr_ntt(rows, k, inverse)
    out = np.moveaxis(rows.astype(np.uint32), -1, 0).reshape(N_DIGITS, *batch, n)
    return jnp.asarray(out)


def _ntt_any(x: jnp.ndarray, k: int, inverse: bool) -> jnp.ndarray:
    mesh = _mesh_for(1 << k)
    if mesh is not None:
        from ..mesh.ntt import ntt_natural  # local import: mesh imports ops

        return ntt_natural(mesh, x, k, inverse)
    if _use_native_ntt(x):
        return _ntt_native(x, k, inverse)
    return ntt(x, k, inverse)


def coeffs_of(values: jnp.ndarray, k: int) -> jnp.ndarray:
    """Evaluations over H (natural order) -> coefficients."""
    return _ntt_any(values, k, inverse=True)


def values_of(coeffs: jnp.ndarray, k: int) -> jnp.ndarray:
    return _ntt_any(coeffs, k, inverse=False)


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
    """Evaluate degree-<2^k polynomials on the extended coset g*H_ext.
    Batched along any middle axes: (D, ..., 2^k) -> (D, ..., 2^k_ext)."""
    batch = coeffs.shape[1:-1]
    ones = (1,) * len(batch)
    scale = jnp.asarray(_coset_scale_digits(k, k_ext)).reshape(N_DIGITS, *ones, 1 << k)
    scaled = f.mont_mul(SPEC, coeffs, scale)
    padded = jnp.zeros((N_DIGITS, *batch, 1 << k_ext), jnp.uint32)
    padded = padded.at[..., : 1 << k].set(scaled)
    return _ntt_any(padded, k_ext, inverse=False)


@functools.lru_cache(maxsize=None)
def _coset_unscale_digits(k_ext: int) -> np.ndarray:
    g_inv = pow(host.FR_GENERATOR, P - 2, P)
    out, acc = [], 1
    for _ in range(1 << k_ext):
        out.append(acc * f.FR.r_mod_p % P)
        acc = acc * g_inv % P
    return pack_values(out)


@functools.partial(jax.jit, static_argnums=(1, 2))
def coeffs_from_extended(evals_ext: jnp.ndarray, k: int, k_ext: int) -> jnp.ndarray:
    """Inverse of extended_coset_evals: coset evals -> coefficients (len 2^k_ext)."""
    batch = evals_ext.shape[1:-1]
    ones = (1,) * len(batch)
    coeffs = _ntt_any(evals_ext, k_ext, inverse=True)
    scale = jnp.asarray(_coset_unscale_digits(k_ext)).reshape(N_DIGITS, *ones, 1 << k_ext)
    return f.mont_mul(SPEC, coeffs, scale)


# -- evaluation at a point ---------------------------------------------------


@jax.jit
def _suffix_sum(arr: jnp.ndarray) -> jnp.ndarray:
    """Inclusive suffix sum (mod p) along the LAST axis via a fori_loop
    Hillis-Steele scan: ONE compiled f.add body, log2(n) rounds."""
    n = arr.shape[-1]
    if n <= 1:
        return arr
    j = jnp.arange(n, dtype=jnp.int32)

    def body(i, x):
        shift = jnp.left_shift(jnp.int32(1), i)
        rolled = jnp.roll(x, -shift, axis=-1)
        s = f.add(SPEC, x, rolled)
        return jnp.where(j < n - shift, s, x)

    return jax.lax.fori_loop(0, (n - 1).bit_length(), body, arr)


@jax.jit
def _sum_reduce(arr: jnp.ndarray) -> jnp.ndarray:
    """Tree-sum along the LAST axis (mod p): (D, ..., n) -> (D, ..., 1)."""
    n = arr.shape[-1]
    if n > 1 and _compile_lean():
        # roll-and-add at constant width: one compiled f.add body.
        j = jnp.arange(n, dtype=jnp.int32)

        def body(i, x):
            half = jnp.left_shift(jnp.int32(1), i)
            rolled = jnp.roll(x, -half, axis=-1)
            s = f.add(SPEC, x, rolled)
            return jnp.where(j < n - half, s, x)

        return jax.lax.fori_loop(0, (n - 1).bit_length(), body, arr)[..., :1]
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            arr = jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, pad)])
        arr = f.add(SPEC, arr[..., :half], arr[..., half:])
        n = half
    return arr


@functools.partial(jax.jit, static_argnums=(1,))
def sum_axis(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Tree-sum (mod p) along one axis, removing it (no transpose)."""
    n = arr.shape[axis]
    while n > 1:
        half = (n + 1) // 2
        if half * 2 > n:
            pads = [(0, 0)] * arr.ndim
            pads[axis] = (0, half * 2 - n)
            arr = jnp.pad(arr, pads)
        a = jax.lax.slice_in_dim(arr, 0, half, axis=axis)
        b = jax.lax.slice_in_dim(arr, half, 2 * half, axis=axis)
        arr = f.add(SPEC, a, b)
        n = half
    return jnp.squeeze(arr, axis=axis)


def powers_dev(xs: list[int], n: int) -> jnp.ndarray:
    """(D, len(xs), n) Montgomery power tables computed ON DEVICE: row j is
    [1, x_j, x_j^2, ...]. One tiny h2d of the bases + a log-depth prefix
    product — replaces the O(n)-Python host power loops (and their big
    transfers) the evaluator used to pay per opening point."""
    m = len(xs)
    base = jnp.asarray(f.pack_ints([x % P * SPEC.r_mod_p % P for x in xs]))
    one = jnp.asarray(f.pack_ints([SPEC.r_mod_p]))
    arr = jnp.concatenate(
        [
            jnp.broadcast_to(one[:, :, None], (base.shape[0], m, 1)),
            jnp.broadcast_to(base[:, :, None], (base.shape[0], m, n - 1)),
        ],
        axis=2,
    )
    return prefix_product(arr)


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


def _compile_lean() -> bool:
    """Lowering choice for the scans below (see utils/lean.py): the
    associative_scan forms unroll ~2*log2(n) mont_mul subgraphs (minutes of
    XLA:CPU compile); the fori_loop Hillis-Steele forms compile ONE mont_mul
    regardless of n at n*log n runtime work — the right trade on the
    compile-bound CPU path, the wrong one on accelerators."""
    from ..utils.lean import compile_lean

    return compile_lean()


def _hillis_scan_mul(arr: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Inclusive prefix (or suffix) product along the LAST axis via a
    fori_loop Hillis-Steele scan: one compiled mont_mul body, log2(n) rounds."""
    n = arr.shape[-1]
    if n <= 1:
        return arr
    rounds = (n - 1).bit_length()
    j = jnp.arange(n, dtype=jnp.int32)

    def body(i, x):
        shift = jnp.left_shift(jnp.int32(1), i)
        rolled = jnp.roll(x, -shift if reverse else shift, axis=-1)
        mask = (j < n - shift) if reverse else (j >= shift)
        prod = f.mont_mul(SPEC, x, rolled)
        return jnp.where(mask, prod, x)

    return jax.lax.fori_loop(0, rounds, body, arr)


@jax.jit
def prefix_product(arr: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix product along the LAST axis (Montgomery form)."""
    if _compile_lean():
        return _hillis_scan_mul(arr, reverse=False)
    return jax.lax.associative_scan(
        lambda a, b: f.mont_mul(SPEC, a, b), arr, axis=arr.ndim - 1
    )


@jax.jit
def batch_inverse(arr: jnp.ndarray) -> jnp.ndarray:
    """Elementwise inverse of nonzero Montgomery values via the Montgomery
    product trick: inv(a_i) = pre_{i-1} * suf_{i+1} * T^{-1} with pre/suf the
    prefix/suffix products and T the total. Two log-depth scans + ONE Fermat
    ladder on a single lane, instead of a 380-step ladder over the whole
    batch — the prover calls this once per grand-product column."""
    ax = arr.ndim - 1
    n = arr.shape[ax]
    if n == 1:
        return f.mont_inv(SPEC, arr)
    mul = lambda a, b: f.mont_mul(SPEC, a, b)
    if _compile_lean():
        pre = _hillis_scan_mul(arr, reverse=False)
        suf = _hillis_scan_mul(arr, reverse=True)
    else:
        pre = jax.lax.associative_scan(mul, arr, axis=ax)
        suf = jax.lax.associative_scan(mul, arr, axis=ax, reverse=True)
    one_col = jnp.broadcast_to(
        jnp.asarray(f.pack_ints([SPEC.r_mod_p])).reshape((N_DIGITS,) + (1,) * (arr.ndim - 1)),
        arr.shape[:-1] + (1,),
    )
    total_inv = f.mont_inv(SPEC, pre[..., -1:])
    pre_shift = jnp.concatenate([one_col, pre[..., :-1]], axis=ax)
    suf_shift = jnp.concatenate([suf[..., 1:], one_col], axis=ax)
    return mul(mul(pre_shift, suf_shift), total_inv)


def synthetic_divide(coeffs: jnp.ndarray, z: int) -> jnp.ndarray:
    """(f(X) - f(z)) / (X - z) given coefficient form; returns quotient coeffs
    (same length, top coefficient zero).

    q_i = sum_{j>i} c_j z^{j-i-1} = z^{-(i+1)} * S_i with S_i = suffix sum of
    d_j = c_j z^j — so the scan combine is a plain modular ADD (tiny XLA
    graph; the earlier affine-map scan with mont_mul combines produced a
    graph big enough to crash XLA:CPU's LLVM backend) and the mont_muls
    happen in two batched elementwise passes against host-precomputed power
    vectors. z is the host-side opening point (a transcript challenge)."""
    n = coeffs.shape[1]
    if z % P == 0:  # q_i = c_{i+1}: degenerate (never hit by real challenges)
        return jnp.concatenate(
            [coeffs[:, 1:], jnp.zeros((N_DIGITS, 1), jnp.uint32)], axis=1
        )
    zpow = np.empty(n, dtype=object)
    zinvpow = np.empty(n, dtype=object)
    zinv = pow(z, P - 2, P)
    acc, iacc = f.FR.r_mod_p, zinv * f.FR.r_mod_p % P  # z^0*R, z^-1*R
    for i in range(n):
        zpow[i] = acc
        zinvpow[i] = iacc
        acc = acc * z % P
        iacc = iacc * zinv % P
    d = f.mont_mul(SPEC, coeffs, jnp.asarray(pack_values(zpow)))
    incl = _suffix_sum(d)
    s = jnp.concatenate([incl[:, 1:], jnp.zeros((N_DIGITS, 1), jnp.uint32)], axis=1)
    return f.mont_mul(SPEC, s, jnp.asarray(pack_values(zinvpow)))


def fr_digits_mont(x: int) -> jnp.ndarray:
    return jnp.asarray(pack_values([x * f.FR.r_mod_p % P]))[:, 0]
