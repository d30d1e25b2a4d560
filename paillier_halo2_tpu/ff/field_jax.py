"""Vectorized BN254 prime-field arithmetic on TPU-friendly digit vectors.

TPU-native replacement for halo2curves' Montgomery Fr/Fq arithmetic
(SURVEY.md section 2.2, "BN254 field/curve arithmetic"). Every field element is
32 little-endian 8-bit digits held in uint32 lanes, **digits-first** layout:
shape (n_digits, *batch) so the batch axis maps onto TPU vector lanes and every
op below is a fixed, static-shape chain of elementwise ops / small convolutions
that XLA can fuse. Multiplication is Montgomery (R = 2^256) built from three
digit convolutions — two of which have constant operands (mu, p) and can later
be lowered to MXU matmuls in Pallas. Exact carry/borrow propagation uses a
Kogge-Stone carry-lookahead via `lax.associative_scan` (log-depth, no serial
digit loop).

All functions are pure and jit/vmap/shard_map-friendly: no data-dependent
shapes, no Python branches on traced values.
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import host
from .limbs import DIGIT_BITS, DIGIT_MASK, N_DIGITS, int_to_digits

U32 = jnp.uint32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# Field specification (constants precomputed on host)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """All per-field constants needed by the device kernels."""

    p: int
    name: str
    n_digits: int = N_DIGITS

    @functools.cached_property
    def p_digits(self) -> np.ndarray:
        return int_to_digits(self.p, self.n_digits)

    @functools.cached_property
    def mu_digits(self) -> np.ndarray:
        """mu = -p^{-1} mod 2^256 (whole-R Montgomery REDC multiplier)."""
        r = 1 << (self.n_digits * DIGIT_BITS)
        return int_to_digits((-pow(self.p, -1, r)) % r, self.n_digits)

    @functools.cached_property
    def r_mod_p(self) -> int:
        return (1 << (self.n_digits * DIGIT_BITS)) % self.p

    @functools.cached_property
    def r2_digits(self) -> np.ndarray:
        """R^2 mod p — multiplier for to-Montgomery conversion."""
        return int_to_digits(self.r_mod_p * self.r_mod_p % self.p, self.n_digits)

    @functools.cached_property
    def one_digits(self) -> np.ndarray:
        return int_to_digits(1, self.n_digits)

    @functools.cached_property
    def one_mont_digits(self) -> np.ndarray:
        """1 in Montgomery form = R mod p."""
        return int_to_digits(self.r_mod_p, self.n_digits)


FR = FieldSpec(host.FR_MOD, "Fr")
FQ = FieldSpec(host.FQ_MOD, "Fq")


def _const(arr: np.ndarray, batch_ndim: int) -> jnp.ndarray:
    """Reshape a (n_digits,) host constant for digits-first broadcasting."""
    return jnp.asarray(arr, U32).reshape(arr.shape + (1,) * batch_ndim)


# ---------------------------------------------------------------------------
# Carry machinery (digit axis = 0)
# ---------------------------------------------------------------------------


def _shift_up(c: jnp.ndarray) -> jnp.ndarray:
    """out[i] = c[i-1]; out[0] = 0; c[last] is dropped (caller sizes arrays)."""
    pad = [(1, 0)] + [(0, 0)] * (c.ndim - 1)
    return jnp.pad(c[:-1], pad)


def _kogge_stone_carries(g: jnp.ndarray, pr: jnp.ndarray) -> jnp.ndarray:
    """Carry-in per digit from generate/propagate bits (uint32 0/1).

    c[0] = 0; c[i+1] = g[i] | (pr[i] & c[i]). Log-depth via associative scan.
    """

    def combine(left, right):
        gl, pl = left
        gr, prr = right
        return gr | (prr & gl), pl & prr

    gpref, _ = jax.lax.associative_scan(combine, (g, pr), axis=0)
    return _shift_up(gpref)


@partial(jax.jit, static_argnums=(1,))
def carry_normalize(d: jnp.ndarray, max_digit: int) -> jnp.ndarray:
    """Exactly normalize a redundant digit vector to digits in [0, 256).

    `max_digit` is a static bound on the input digit values. Overflow past the
    last digit is dropped (i.e. the result is the value mod 2^(8*len)); size the
    array so the value fits when exactness is required.
    """
    d = d.astype(U32)
    bound = max_digit
    # Local passes shrink digit magnitude geometrically until h = d>>8 is 0/1.
    while bound > 2 * DIGIT_MASK + 1:  # 511
        d = (d & DIGIT_MASK) + _shift_up(d >> DIGIT_BITS)
        bound = DIGIT_MASK + (bound >> DIGIT_BITS)
    # Exact finish: value = x + shift(h) with x < 256, h in {0, 1}.
    x = d & DIGIT_MASK
    y = _shift_up(d >> DIGIT_BITS)
    s = x + y
    carries = _kogge_stone_carries((s > DIGIT_MASK).astype(U32), (s == DIGIT_MASK).astype(U32))
    return (s + carries) & DIGIT_MASK


@jax.jit
def sub_digits(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) mod 2^(8*len) for normalized digit vectors; also returns a<b flag.

    Returns (diff_digits, underflow) where underflow is uint32 0/1 per batch
    element. When underflow==0 the digits are the exact difference a - b.
    """
    d = a.astype(I32) - b.astype(I32)
    borrows = _kogge_stone_carries((d < 0).astype(U32), (d == 0).astype(U32))
    r = d - borrows.astype(I32)
    out = jnp.where(r < 0, r + (1 << DIGIT_BITS), r).astype(U32)
    # Borrow out of the top digit == 1 iff a < b.
    top = d[-1] - borrows[-1].astype(I32)
    underflow = (top < 0).astype(U32)
    return out, underflow


@jax.jit
def ge_digits(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b on normalized digit vectors (uint32 0/1 per batch element)."""
    _, under = sub_digits(a, b)
    return jnp.uint32(1) - under


# ---------------------------------------------------------------------------
# Digit convolution (schoolbook product in redundant form)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _conv_gather_matrix(n: int, m: int, out_len: int) -> np.ndarray:
    """(out_len, n*m) 0/1 matrix summing anti-diagonals of the outer product."""
    t = np.zeros((out_len, n * m), np.float32)
    for i in range(n):
        for j in range(m):
            if i + j < out_len:
                t[i + j, i * m + j] = 1.0
    return t


@functools.lru_cache(maxsize=None)
def _conv_const_matrix(bvec: tuple, n: int, out_len: int) -> np.ndarray:
    """(out_len, n) matrix with M[k, i] = b[k-i] — convolution by a constant."""
    t = np.zeros((out_len, n), np.float32)
    for i in range(n):
        for j, bv in enumerate(bvec):
            if i + j < out_len:
                t[i + j, i] = float(bv)
    return t


# Which convolution lowering to use: "matmul" (single dot_general against a
# 0/1 gather matrix — minimal HLO, MXU-eligible; the extra flops ride an
# otherwise idle MXU) or "loop" (unrolled shift-accumulate on the VPU —
# compute-optimal flops but slow dynamic-update-slice chains on CPU). The
# Pallas kernel supersedes both on the TPU hot path.
CONV_IMPL = "matmul"


def conv_digits(a: jnp.ndarray, b: jnp.ndarray, out_len: int | None = None) -> jnp.ndarray:
    """out[k] = sum_{i+j=k} a[i]*b[j], truncated to out_len digits.
    Inputs normalized (< 256); accumulated products stay < 2^22."""
    n, m = a.shape[0], b.shape[0]
    if out_len is None:
        out_len = n + m - 1
    if CONV_IMPL == "loop":
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        out = jnp.zeros((out_len,) + batch, U32)
        for i in range(min(n, out_len)):
            width = min(m, out_len - i)
            out = out.at[i : i + width].add(a[i] * b[:width])
        return out
    return _conv_digits_matmul(a, b, out_len)


def _conv_digits_matmul(a: jnp.ndarray, b: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Outer-product + one constant-matrix contraction: the whole schoolbook
    product is a single dot_general. Exactness: TPU MXU rounds f32 matmul
    inputs to bf16 (exact only below 2^8), so the dot is fed exact bytes —
    products split into lo/hi bytes, two matmuls."""
    n, m = a.shape[0], b.shape[0]
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    au = jnp.broadcast_to(a, (n,) + batch)
    bu = jnp.broadcast_to(b, (m,) + batch)
    prod = (au[:, None] * bu[None, :]).reshape((n * m,) + batch)  # < 2^16
    t = jnp.asarray(_conv_gather_matrix(n, m, out_len))
    lo = (prod & DIGIT_MASK).astype(jnp.float32)
    hi = (prod >> DIGIT_BITS).astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    clo = jax.lax.dot_general(t, lo, dims, preferred_element_type=jnp.float32)
    chi = jax.lax.dot_general(t, hi, dims, preferred_element_type=jnp.float32)
    return clo.astype(U32) + (chi.astype(U32) << DIGIT_BITS)


def conv_const(a: jnp.ndarray, bvec: np.ndarray, out_len: int) -> jnp.ndarray:
    """Convolution of digit vector a with a host constant digit vector."""
    n = a.shape[0]
    if CONV_IMPL == "loop":
        bdev = jnp.asarray(np.asarray(bvec, dtype=np.uint32)).reshape(
            (len(bvec),) + (1,) * (a.ndim - 1)
        )
        m = len(bvec)
        out = jnp.zeros((out_len,) + a.shape[1:], U32)
        for i in range(min(n, out_len)):
            width = min(m, out_len - i)
            out = out.at[i : i + width].add(a[i] * bdev[:width])
        return out
    t = jnp.asarray(_conv_const_matrix(tuple(int(x) for x in bvec), n, out_len))
    out = jax.lax.dot_general(
        t, a.astype(jnp.float32), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return out.astype(U32)


# ---------------------------------------------------------------------------
# Modular ops
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0,))
def cond_sub_p(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Reduce a in [0, 2p) to [0, p)."""
    p = _const(spec.p_digits, a.ndim - 1)
    diff, under = sub_digits(a, p)
    return jnp.where(under.astype(bool), a, diff)


@partial(jax.jit, static_argnums=(0,))
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = carry_normalize(a + b, max_digit=2 * DIGIT_MASK)
    return cond_sub_p(spec, s)


@partial(jax.jit, static_argnums=(0,))
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d_ab, under = sub_digits(a, b)
    # If a < b the wrapped digits are wrong; compute p - (b - a) instead.
    d_ba, _ = sub_digits(b, a)
    p = _const(spec.p_digits, a.ndim - 1)
    p_minus, _ = sub_digits(p, d_ba)
    return jnp.where(under.astype(bool), p_minus, d_ab)


@partial(jax.jit, static_argnums=(0,))
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    p = _const(spec.p_digits, a.ndim - 1)
    d, _ = sub_digits(p, a)
    is_zero = jnp.all(a == 0, axis=0)
    return jnp.where(is_zero, a, d)


# Pallas kernel dispatch: on TPU, batched Montgomery products above this lane
# count run as the fused MXU kernel (ff/pallas_mulmod.py). Resolved lazily so
# importing this module never initializes a backend.
_PALLAS_ENABLED: bool | None = None
PALLAS_MIN_LANES = 2048


def _use_pallas() -> bool:
    global _PALLAS_ENABLED
    if _PALLAS_ENABLED is None:
        import os

        if os.environ.get("PAILLIER_TPU_FORCE_XLA_MUL"):
            _PALLAS_ENABLED = False
        else:
            try:
                _PALLAS_ENABLED = jax.devices()[0].platform != "cpu"
            except Exception:
                _PALLAS_ENABLED = False
    return _PALLAS_ENABLED


@partial(jax.jit, static_argnums=(0,))
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p on normalized digit vectors.

    Whole-R REDC: t = a*b; m = (t mod R)*mu mod R; out = (t + m*p) / R.
    Three convolutions; mu- and p-convolutions have constant operands.
    On TPU, large batches dispatch to the fused Pallas MXU kernel.
    """
    nd = spec.n_digits
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    lanes = int(np.prod(batch)) if batch else 0
    if _use_pallas() and lanes >= PALLAS_MIN_LANES:
        from .pallas_mulmod import BLOCK, mont_mul_pallas

        af = jnp.broadcast_to(a, (nd,) + batch).reshape(nd, lanes)
        bf = jnp.broadcast_to(b, (nd,) + batch).reshape(nd, lanes)
        pad = (-lanes) % BLOCK
        if pad:
            af = jnp.pad(af, [(0, 0), (0, pad)])
            bf = jnp.pad(bf, [(0, 0), (0, pad)])
        out = mont_mul_pallas(spec, af, bf)
        return out[:, :lanes].reshape((nd,) + batch)
    batch_ndim = a.ndim - 1
    t = conv_digits(a, b)  # 2*nd-1 digits, < 2^22
    t_lo = carry_normalize(t[:nd], max_digit=nd * DIGIT_MASK * DIGIT_MASK)
    m = conv_const(t_lo, spec.mu_digits, out_len=nd)
    m = carry_normalize(m, max_digit=nd * DIGIT_MASK * DIGIT_MASK)
    mp = conv_const(m, spec.p_digits, out_len=2 * nd - 1)
    pad = [(0, 1)] + [(0, 0)] * batch_ndim
    u = jnp.pad(t, pad) + jnp.pad(mp, pad)  # 2*nd digits, < 2^23
    u = carry_normalize(u, max_digit=2 * nd * DIGIT_MASK * DIGIT_MASK)
    res = u[nd:]  # low nd digits are 0 by construction of m
    return cond_sub_p(spec, res)


@partial(jax.jit, static_argnums=(0,))
def mont_sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


@partial(jax.jit, static_argnums=(0,))
def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, _const(spec.r2_digits, a.ndim - 1))


@partial(jax.jit, static_argnums=(0,))
def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, _const(spec.one_digits, a.ndim - 1))


@partial(jax.jit, static_argnums=(0, 2))
def mont_pow_fixed(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a in Montgomery form, e a static host int (square-and-multiply).

    Sequential lax.scan over the exponent's bits (MSB first) — compiles once,
    runs 'bitlen' steps, each a batched sqr + select(mul).
    """
    if e == 0:
        return jnp.broadcast_to(_const(spec.one_mont_digits, a.ndim - 1), a.shape)
    bits = np.array([int(c) for c in bin(e)[2:]], dtype=np.uint32)
    acc0 = jnp.broadcast_to(_const(spec.one_mont_digits, a.ndim - 1), a.shape)

    def body(acc, bit):
        acc = mont_sqr(spec, acc)
        withmul = mont_mul(spec, acc, a)
        acc = jnp.where(bit.astype(bool), withmul, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, jnp.asarray(bits))
    return acc


@partial(jax.jit, static_argnums=(0,))
def mont_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse via Fermat: a^{p-2}. Input/output in Montgomery form."""
    return mont_pow_fixed(spec, a, spec.p - 2)


# ---------------------------------------------------------------------------
# Host <-> device helpers (digits-first layout)
# ---------------------------------------------------------------------------


def pack_ints(xs, n_digits: int = N_DIGITS) -> np.ndarray:
    """List of ints -> uint32[n_digits, len(xs)] (digits-first)."""
    out = np.zeros((n_digits, len(xs)), dtype=np.uint32)
    for i, x in enumerate(xs):
        out[:, i] = int_to_digits(x, n_digits)
    return out


def unpack_ints(arr) -> list[int]:
    """uint32[n_digits, ...batch] -> flat list of ints (row-major over batch)."""
    arr = np.asarray(arr)
    flat = arr.reshape(arr.shape[0], -1)
    out = []
    for j in range(flat.shape[1]):
        acc = 0
        for v in reversed(flat[:, j].tolist()):
            acc = (acc << DIGIT_BITS) + int(v)
        out.append(acc)
    return out
