"""Fused Pallas TPU kernels for batched BN254 G1 point addition — the MSM
bucket-accumulation hot op (SURVEY.md section 2.2 "Pippenger MSM", section 3.3
hot loops).

The XLA path in ec/bn254.py issues ~11 separate Montgomery-multiply kernels
per mixed add, each round-tripping (32, N) digit arrays through HBM. Here the
whole add-with-doubling-fallback is ONE kernel per (32, BLOCK) tile: all 18
Montgomery products (11 generic + 7 doubling branch) ride the MXU back to
back with intermediates resident in VMEM, and the edge-case selects
(P+inf, inf+Q, P+P, P+(-P)) ride the VPU.

Field ops reuse the mulmod building blocks from ff/pallas_mulmod.py; the
exceptional-case semantics mirror ec/bn254.py padd_mixed exactly (property
tests compare the two paths lane for lane).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff.field_jax import FieldSpec
from ..ff.limbs import DIGIT_BITS, DIGIT_MASK, N_DIGITS
from ..ff.pallas_mulmod import MulPlan, _carry_normalize, _sub_digits, get_plan

BLOCK = 512  # measured best on v5e for the conv mul body (268 vs 354 ns/lane)

# Dense 256-bit packing: 8 uint32 words per coordinate (word k holds digits
# 4k..4k+3 little-endian). The MSM bucket loop gathers points in this form —
# 64 bytes/point instead of 256 — because TPU gathers are per-index bound and
# one (L, 16) row gather replaces two (32, L) digit-column gathers.
PACK_WORDS = 16  # 8 for X, 8 for Y


def _unpack_words(w):
    """(8, B) packed uint32 -> (32, B) 8-bit digits, little-endian."""
    parts = [(w >> (8 * i)) & 0xFF for i in range(4)]  # each (8, B)
    return jnp.stack(parts, axis=1).reshape(4 * w.shape[0], w.shape[1])


def _field_add(a, b, pvec):
    s = _carry_normalize(a + b, 2 * DIGIT_MASK)
    d, under = _sub_digits(s, pvec)
    return jnp.where(under, s, d)


def _field_sub(a, b, pvec):
    d, under = _sub_digits(a, b)
    # wrapped case: (a - b) mod 2^256 + p, exact since a - b + p < 2^256.
    w = _carry_normalize(d + pvec, 2 * DIGIT_MASK)
    return jnp.where(under, w, d)


def _is_zero(a):
    return jnp.all(a == 0, axis=0, keepdims=True)


def _sel(mask, a, b):
    return jnp.where(mask, a, b)


def _mixed_add_full(X1, Y1, Z1, X2, Y2, q_inf, plan, consts, pvec, one,
                    with_double: bool = True):
    """Jacobian (X1,Y1,Z1) + affine (X2,Y2) with all edge cases; q_inf is a
    (1, BLOCK) mask. Mirrors ec/bn254.py padd_mixed.

    with_double=False drops the doubling branch (7 Montgomery products) and
    the h/r zero tests: valid when the affine operand never equals the
    accumulator (distinct-base bucket accumulation). In that variant a true
    doubling or annihilation input degrades to Z3 == 0 (the infinity
    encoding) instead of a wrong finite point."""
    mm = lambda x, y: plan.body(x, y, *consts)
    add = lambda x, y: _field_add(x, y, pvec)
    sub = lambda x, y: _field_sub(x, y, pvec)

    z1z1 = mm(Z1, Z1)
    u2 = mm(X2, z1z1)
    s2 = mm(Y2, mm(Z1, z1z1))
    h = sub(u2, X1)
    r = sub(s2, Y1)

    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(X1, hh)
    rr = mm(r, r)
    X3 = sub(sub(rr, hhh), add(v, v))
    Y3 = sub(mm(r, sub(v, X3)), mm(Y1, hhh))
    Z3 = mm(Z1, h)

    p_inf = _is_zero(Z1)
    zero = jnp.zeros_like(Z1)

    if with_double:
        # doubling branch (dbl-2009-l, a = 0)
        A = mm(X1, X1)
        B = mm(Y1, Y1)
        C = mm(B, B)
        t = mm(add(X1, B), add(X1, B))
        D = sub(sub(t, A), C)
        D = add(D, D)
        E = add(add(A, A), A)
        F = mm(E, E)
        Xd = sub(F, add(D, D))
        C8 = add(C, C)
        C8 = add(C8, C8)
        C8 = add(C8, C8)
        Yd = sub(mm(E, sub(D, Xd)), C8)
        YZ = mm(Y1, Z1)
        Zd = add(YZ, YZ)

        h_zero = _is_zero(h)
        r_zero = _is_zero(r)

        dbl = h_zero & r_zero
        X3 = _sel(dbl, Xd, X3)
        Y3 = _sel(dbl, Yd, Y3)
        Z3 = _sel(dbl, Zd, Z3)
        # P + (-P) -> infinity
        annihilate = h_zero & ~r_zero & ~p_inf
        X3 = _sel(annihilate, one, X3)
        Y3 = _sel(annihilate, one, Y3)
        Z3 = _sel(annihilate, zero, Z3)
    # inf + Q -> Q (as Jacobian with Z = 1)
    X3 = _sel(p_inf, X2, X3)
    Y3 = _sel(p_inf, Y2, Y3)
    Z3 = _sel(p_inf, _sel(q_inf, zero, one), Z3)
    # P + inf -> P
    X3 = _sel(q_inf, X1, X3)
    Y3 = _sel(q_inf, Y1, Y3)
    Z3 = _sel(q_inf, Z1, Z3)
    return X3, Y3, Z3


def _jacobian_add_full(X1, Y1, Z1, X2, Y2, Z2, plan, consts, pvec, one,
                       with_double: bool = True):
    """General Jacobian + Jacobian with all edge cases; mirrors
    ec/bn254.py padd (16 generic + 7 doubling Montgomery products).
    with_double=False: see _mixed_add_full."""
    mm = lambda x, y: plan.body(x, y, *consts)
    add = lambda x, y: _field_add(x, y, pvec)
    sub = lambda x, y: _field_sub(x, y, pvec)

    z1z1 = mm(Z1, Z1)
    z2z2 = mm(Z2, Z2)
    u1 = mm(X1, z2z2)
    u2 = mm(X2, z1z1)
    s1 = mm(Y1, mm(Z2, z2z2))
    s2 = mm(Y2, mm(Z1, z1z1))
    h = sub(u2, u1)
    r = sub(s2, s1)

    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(u1, hh)
    rr = mm(r, r)
    X3 = sub(sub(rr, hhh), add(v, v))
    Y3 = sub(mm(r, sub(v, X3)), mm(s1, hhh))
    Z3 = mm(mm(Z1, Z2), h)

    p_inf = _is_zero(Z1)
    q_inf = _is_zero(Z2)

    if with_double:
        # doubling branch
        A = mm(X1, X1)
        B = mm(Y1, Y1)
        C = mm(B, B)
        t = mm(add(X1, B), add(X1, B))
        D = sub(sub(t, A), C)
        D = add(D, D)
        E = add(add(A, A), A)
        F = mm(E, E)
        Xd = sub(F, add(D, D))
        C8 = add(C, C)
        C8 = add(C8, C8)
        C8 = add(C8, C8)
        Yd = sub(mm(E, sub(D, Xd)), C8)
        YZ = mm(Y1, Z1)
        Zd = add(YZ, YZ)

        h_zero = _is_zero(h)
        r_zero = _is_zero(r)
        zero = jnp.zeros_like(Z1)

        dbl = h_zero & r_zero
        X3 = _sel(dbl, Xd, X3)
        Y3 = _sel(dbl, Yd, Y3)
        Z3 = _sel(dbl, Zd, Z3)
        annihilate = h_zero & ~r_zero & ~p_inf & ~q_inf
        X3 = _sel(annihilate, one, X3)
        Y3 = _sel(annihilate, one, Y3)
        Z3 = _sel(annihilate, zero, Z3)
    X3 = _sel(q_inf, X1, X3)
    Y3 = _sel(q_inf, Y1, Y3)
    Z3 = _sel(q_inf, Z1, Z3)
    X3 = _sel(p_inf, X2, X3)
    Y3 = _sel(p_inf, Y2, Y3)
    Z3 = _sel(p_inf, Z2, Z3)
    return X3, Y3, Z3


def _shared_consts(spec: FieldSpec, nd: int):
    """(plan, plan const values, pvec, one, plan const specs, vec spec)."""
    plan = get_plan(spec.p)
    pvec = jnp.broadcast_to(jnp.asarray(spec.p_digits, jnp.uint32).reshape(nd, 1), (nd, BLOCK))
    one_digits = [(spec.r_mod_p >> (DIGIT_BITS * i)) & DIGIT_MASK for i in range(nd)]
    one = jnp.broadcast_to(jnp.asarray(one_digits, jnp.uint32).reshape(nd, 1), (nd, BLOCK))
    vec_spec = pl.BlockSpec((nd, BLOCK), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return plan, plan.const_values(), pvec, one, plan.const_specs() + [vec_spec, vec_spec]


def _jadd_kernel(plan, n_consts, *refs, with_double=True):
    x1, y1, z1, x2, y2, z2 = refs[:6]
    consts = tuple(r[:] for r in refs[6 : 6 + n_consts])
    pvec, one, ox, oy, oz = refs[6 + n_consts :]
    X3, Y3, Z3 = _jacobian_add_full(
        x1[:], y1[:], z1[:], x2[:], y2[:], z2[:],
        plan, consts, pvec[:], one[:],
        with_double=with_double,
    )
    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3


@functools.partial(jax.jit, static_argnums=(0, 7, 8))
def padd_pallas(spec: FieldSpec, X1, Y1, Z1, X2, Y2, Z2, interpret: bool = False,
                nodouble: bool = False):
    """Fused Jacobian + Jacobian add on (N_DIGITS, N) digit arrays."""
    nd = spec.n_digits
    n = X1.shape[1]
    assert n % BLOCK == 0, f"pad batch to a multiple of {BLOCK}"
    plan, cvals, pvec, one, tail_specs = _shared_consts(spec, nd)

    data_spec = pl.BlockSpec((nd, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_jadd_kernel, plan, len(cvals), with_double=not nodouble),
        grid=(n // BLOCK,),
        in_specs=[data_spec] * 6 + tail_specs,
        out_specs=[data_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((nd, n), jnp.uint32)] * 3,
        interpret=interpret,
    )(X1, Y1, Z1, X2, Y2, Z2, *cvals, pvec, one)
    return tuple(out)


def _kernel(plan, n_consts, *refs, with_double=True):
    x1, y1, z1, x2, y2, qinf = refs[:6]
    consts = tuple(r[:] for r in refs[6 : 6 + n_consts])
    pvec, one, ox, oy, oz = refs[6 + n_consts :]
    X3, Y3, Z3 = _mixed_add_full(
        x1[:], y1[:], z1[:], x2[:], y2[:], qinf[:] != 0,
        plan, consts, pvec[:], one[:],
        with_double=with_double,
    )
    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3


@functools.partial(jax.jit, static_argnums=(0, 7, 8))
def padd_mixed_pallas(
    spec: FieldSpec, X1, Y1, Z1, X2, Y2, q_inf, interpret: bool = False,
    nodouble: bool = False,
):
    """Fused mixed add on (N_DIGITS, N) digit arrays; q_inf is an (N,) bool
    mask marking affine operands at infinity. N must be a multiple of BLOCK."""
    nd = spec.n_digits
    n = X1.shape[1]
    assert X1.shape == Y1.shape == Z1.shape == X2.shape == Y2.shape == (nd, n)
    assert n % BLOCK == 0, f"pad batch to a multiple of {BLOCK}"
    plan, cvals, pvec, one, tail_specs = _shared_consts(spec, nd)
    qi = q_inf.astype(jnp.uint32).reshape(1, n)

    data_spec = pl.BlockSpec((nd, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, plan, len(cvals), with_double=not nodouble),
        grid=(n // BLOCK,),
        in_specs=[data_spec] * 5
        + [pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)]
        + tail_specs,
        out_specs=[data_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((nd, n), jnp.uint32)] * 3,
        interpret=interpret,
    )(X1, Y1, Z1, X2, Y2, qi, *cvals, pvec, one)
    return tuple(out)


def _packed_kernel(plan, n_consts, *refs, with_double=True, rows=False):
    x1, y1, z1, pk, qinf = refs[:5]
    consts = tuple(r[:] for r in refs[5 : 5 + n_consts])
    pvec, one, ox, oy, oz = refs[5 + n_consts :]
    w = pk[:].T if rows else pk[:]  # rows=True: operand arrives (BLOCK, 16)
    X3, Y3, Z3 = _mixed_add_full(
        x1[:], y1[:], z1[:],
        _unpack_words(w[:8]), _unpack_words(w[8:]), qinf[:] != 0,
        plan, consts, pvec[:], one[:],
        with_double=with_double,
    )
    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def padd_mixed_packed_pallas(
    spec: FieldSpec, X1, Y1, Z1, packed, q_inf=None, interpret: bool = False,
    nodouble: bool = False,
):
    """Mixed add where the affine operand arrives densely packed in row form
    (N, PACK_WORDS) uint32 (8 words X, 8 words Y — exactly what the MSM
    bucket gather produces); the kernel transposes and unpacks to digits in
    VMEM, so no XLA relayout sits between gather and add. q_inf: optional
    (N,) mask."""
    nd = spec.n_digits
    n = X1.shape[1]
    assert X1.shape == Y1.shape == Z1.shape == (nd, n)
    assert packed.shape == (n, PACK_WORDS)
    assert n % BLOCK == 0, f"pad batch to a multiple of {BLOCK}"
    plan, cvals, pvec, one, tail_specs = _shared_consts(spec, nd)
    if q_inf is None:
        qi = jnp.zeros((1, n), jnp.uint32)
    else:
        qi = q_inf.astype(jnp.uint32).reshape(1, n)

    data_spec = pl.BlockSpec((nd, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, plan, len(cvals), with_double=not nodouble, rows=True),
        grid=(n // BLOCK,),
        in_specs=[data_spec] * 3
        + [pl.BlockSpec((BLOCK, PACK_WORDS), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)]
        + tail_specs,
        out_specs=[data_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((nd, n), jnp.uint32)] * 3,
        interpret=interpret,
    )(X1, Y1, Z1, packed, qi, *cvals, pvec, one)
    return tuple(out)
