"""Lazy-Montgomery fused BN254 point-add kernels — round-3 rewrite of the
MSM bucket-accumulation hot op (VERDICT item 3; SURVEY.md section 3.3).

The round-2 kernels (ec/pallas_point.py) normalize after every field op; on
chip they measure ~6.3 M adds/s against a 200 M/s standalone mulmod — the
carry machinery is the wall. Here the whole madd/jadd formula runs on lazy
signed f32 digit rows (ff/lazy_mont.py): no Kogge-Stone anywhere, three
cheap partial reductions per add, and accumulators stored in HBM as int16
digits (192 B/point instead of 384 B), halving the bucket loop's traffic.

Semantics: nodouble-only (the Pippenger contract — pairwise-distinct affine
bases; a violated contract degrades to a value ZERO mod p in the Z
coordinate, which canonicalize_jp maps to the infinity encoding — never a
wrong finite point; same degradation contract as ec/bn254.py padd).

Accumulator invariant (closed round-over-round, asserted at trace time by
the LV wrapper): digits in [-258, 258], |value| <= 1.0*p per coordinate.
Infinity lanes keep exactly-zero Z digits (exact-zero propagation through
every lazy op), so the in-loop p_inf select stays a plain digit test.

Layout notes: the affine operand arrives as dense packed rows (B, 16)
uint32 — same gather currency as pallas_point.py; unpack in VMEM. The
bf16 REDC matrices ride the MXU; everything else is VPU f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff import lazy_mont as lz
from ..ff.field_jax import FieldSpec
from ..ff.limbs import N_DIGITS

BLOCK = 512

LZ_DTYPE = jnp.int16  # stored accumulator digits (in [-258, 258])


def _unpack_words_f32(w):
    """(8, B) packed uint32 -> (32, B) f32 byte digits."""
    parts = [((w >> (8 * i)) & 0xFF).astype(jnp.int32) for i in range(4)]
    st = jnp.stack(parts, axis=1).reshape(4 * w.shape[0], w.shape[1])
    return st.astype(jnp.float32)


def _mixed_add_lazy(plan, consts, X1, Y1, Z1, X2, Y2, q_inf):
    """One Pippenger bucket accumulation step on LV-wrapped lazy arrays.

    X1/Y1/Z1: accumulator (lazy invariant digits [-258,258], |v| <= p).
    X2/Y2: affine operand, canonical digits. q_inf: (1, B) bool.
    Returns (X3, Y3, Z3) LVs satisfying the same invariant.
    """
    mul = lambda a, b: lz.lv_mul(plan, consts, a, b)
    red = lambda a: lz.lv_reduce(plan, consts, a)
    sub = lz.lv_sub
    add = lz.lv_add
    sel = lz.lv_select

    z1z1 = mul(Z1, Z1)
    u2 = mul(X2, z1z1)
    s2 = mul(Y2, mul(Z1, z1z1))
    h = sub(u2, X1)
    r = sub(s2, Y1)

    hh = mul(h, h)
    hhh = mul(h, hh)
    v = mul(X1, hh)
    rr = mul(r, r)
    x3 = red(sub(sub(rr, hhh), add(v, v)))
    y3 = red(sub(mul(r, sub(v, x3)), mul(Y1, hhh)))
    z3 = red(mul(Z1, h))

    p_inf = jnp.all(Z1.a == 0, axis=0, keepdims=True)
    one = lz.LV(jnp.broadcast_to(consts[5], Z1.a.shape), 0, 255, 1.0)
    zero = lz.lv_zero_like(Z1)

    # inf + Q -> Q (Z = 1, unless Q itself is infinity)
    x3 = sel(p_inf, X2, x3)
    y3 = sel(p_inf, Y2, y3)
    z3 = sel(p_inf, sel(q_inf, zero, one), z3)
    # P + inf -> P
    x3 = sel(q_inf, X1, x3)
    y3 = sel(q_inf, Y1, y3)
    z3 = sel(q_inf, Z1, z3)
    for c in (x3, y3, z3):
        assert c.dmax <= 258 and c.v <= 1.0 + 1e-9, f"acc invariant broken: {c}"
    return x3, y3, z3


def _jacobian_add_lazy(plan, consts, P1, P2):
    """Jacobian + Jacobian (nodouble) on LV triples, same invariant."""
    mul = lambda a, b: lz.lv_mul(plan, consts, a, b)
    red = lambda a: lz.lv_reduce(plan, consts, a)
    sub = lz.lv_sub
    add = lz.lv_add
    sel = lz.lv_select
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2

    z1z1 = mul(Z1, Z1)
    z2z2 = mul(Z2, Z2)
    u1 = mul(X1, z2z2)
    u2 = mul(X2, z1z1)
    s1 = mul(Y1, mul(Z2, z2z2))
    s2 = mul(Y2, mul(Z1, z1z1))
    h = sub(u2, u1)
    r = sub(s2, s1)

    hh = mul(h, h)
    hhh = mul(h, hh)
    v = mul(u1, hh)
    rr = mul(r, r)
    x3 = red(sub(sub(rr, hhh), add(v, v)))
    y3 = red(sub(mul(r, sub(v, x3)), mul(s1, hhh)))
    z3 = red(mul(mul(Z1, Z2), h))

    p_inf = jnp.all(Z1.a == 0, axis=0, keepdims=True)
    q_inf = jnp.all(Z2.a == 0, axis=0, keepdims=True)
    x3 = sel(q_inf, X1, sel(p_inf, X2, x3))
    y3 = sel(q_inf, Y1, sel(p_inf, Y2, y3))
    z3 = sel(q_inf, Z1, sel(p_inf, Z2, z3))
    for c in (x3, y3, z3):
        assert c.dmax <= 258 and c.v <= 1.0 + 1e-9, f"acc invariant broken: {c}"
    return x3, y3, z3


def _wrap_acc(a_i16) -> lz.LV:
    return lz.LV(a_i16.astype(jnp.float32), -258, 258, 1.0)


def _store(x: lz.LV):
    return x.a.astype(LZ_DTYPE)


def _shared(spec: FieldSpec):
    plan = lz.get_lazy_plan(spec.p)
    consts = plan.consts() + (jnp.asarray(plan.one_dig),)
    vec_specs = [
        pl.BlockSpec(tuple(c.shape), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]
    return plan, consts, vec_specs


def _mixed_kernel(plan, n_consts, *refs):
    x1, y1, z1, pk, qinf, negm = refs[:6]
    consts = tuple(r[:] for r in refs[6 : 6 + n_consts])
    ox, oy, oz = refs[6 + n_consts :]
    w = pk[:].T  # (16, BLOCK)
    X2 = lz.LV(_unpack_words_f32(w[:8]), 0, 255, 1.0)
    y2 = _unpack_words_f32(w[8:])
    # signed-window negation: -P = (x, p - y), a digit-wise subtract in the
    # lazy domain (value p - y <= p, digits in [-255, 255])
    y2 = jnp.where(negm[:] != 0, consts[2] - y2, y2)
    Y2 = lz.LV(y2, -255, 255, 1.0)
    X3, Y3, Z3 = _mixed_add_lazy(
        plan, consts,
        _wrap_acc(x1[:]), _wrap_acc(y1[:]), _wrap_acc(z1[:]),
        X2, Y2, qinf[:] != 0,
    )
    ox[:] = _store(X3)
    oy[:] = _store(Y3)
    oz[:] = _store(Z3)


@functools.partial(jax.jit, static_argnums=(0, 7))
def padd_mixed_packed_lazy(spec: FieldSpec, X1, Y1, Z1, packed, q_inf,
                           neg=None, interpret: bool = False):
    """Fused lazy mixed add: int16 accumulators + (N, 16)-packed affine.
    q_inf: (N,) mask; neg: optional (N,) mask negating the affine operand
    (signed Pippenger windows). N must be a multiple of BLOCK."""
    nd = N_DIGITS
    n = X1.shape[1]
    assert X1.shape == Y1.shape == Z1.shape == (nd, n) and X1.dtype == LZ_DTYPE
    assert packed.shape == (n, 16) and n % BLOCK == 0
    plan, consts, tail_specs = _shared(spec)
    interpret = interpret or jax.default_backend() == "cpu"
    qi = q_inf.astype(jnp.int32).reshape(1, n)
    if neg is None:
        ng = jnp.zeros((1, n), jnp.int32)
    else:
        ng = neg.astype(jnp.int32).reshape(1, n)

    acc_spec = pl.BlockSpec((nd, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mixed_kernel, plan, len(consts)),
        grid=(n // BLOCK,),
        in_specs=[acc_spec] * 3
        + [pl.BlockSpec((BLOCK, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [row_spec, row_spec]
        + tail_specs,
        out_specs=[acc_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((nd, n), LZ_DTYPE)] * 3,
        interpret=interpret,
    )(X1, Y1, Z1, packed, qi, ng, *consts)
    return tuple(out)


def _jadd_kernel(plan, n_consts, *refs):
    x1, y1, z1, x2, y2, z2 = refs[:6]
    consts = tuple(r[:] for r in refs[6 : 6 + n_consts])
    ox, oy, oz = refs[6 + n_consts :]
    X3, Y3, Z3 = _jacobian_add_lazy(
        plan, consts,
        (_wrap_acc(x1[:]), _wrap_acc(y1[:]), _wrap_acc(z1[:])),
        (_wrap_acc(x2[:]), _wrap_acc(y2[:]), _wrap_acc(z2[:])),
    )
    ox[:] = _store(X3)
    oy[:] = _store(Y3)
    oz[:] = _store(Z3)


@functools.partial(jax.jit, static_argnums=(0, 7))
def padd_lazy(spec: FieldSpec, X1, Y1, Z1, X2, Y2, Z2, interpret: bool = False):
    """Fused lazy Jacobian + Jacobian add on int16 digit accumulators."""
    nd = N_DIGITS
    n = X1.shape[1]
    assert X1.shape == (nd, n) and X1.dtype == LZ_DTYPE
    assert n % BLOCK == 0
    plan, consts, tail_specs = _shared(spec)
    interpret = interpret or jax.default_backend() == "cpu"
    acc_spec = pl.BlockSpec((nd, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_jadd_kernel, plan, len(consts)),
        grid=(n // BLOCK,),
        in_specs=[acc_spec] * 6 + tail_specs,
        out_specs=[acc_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((nd, n), LZ_DTYPE)] * 3,
        interpret=interpret,
    )(X1, Y1, Z1, X2, Y2, Z2, *consts)
    return tuple(out)


# -- boundary helpers (XLA, once per pipeline stage) -------------------------


def inf_acc(spec: FieldSpec, batch) -> tuple:
    """Fresh int16 infinity accumulators: (one, one, 0) canonical."""
    plan = lz.get_lazy_plan(spec.p)
    one = jnp.broadcast_to(
        jnp.asarray(plan.one_dig, LZ_DTYPE).reshape((N_DIGITS,) + (1,) * len(batch)),
        (N_DIGITS,) + tuple(batch),
    )
    return one, one, jnp.zeros((N_DIGITS,) + tuple(batch), LZ_DTYPE)


def to_lazy_jp(p_u32) -> tuple:
    """Canonical uint32 Jacobian triple -> int16 lazy accumulators."""
    return tuple(c.astype(jnp.int32).astype(LZ_DTYPE) for c in p_u32)


@functools.partial(jax.jit, static_argnums=(0,))
def canonicalize_jp(spec: FieldSpec, X, Y, Z) -> tuple:
    """int16 lazy Jacobian triple -> canonical uint32 digits in [0, p).
    A Z that is zero mod p (soft infinity from a degraded nodouble
    violation) canonicalizes to exact zero digits — the standard infinity
    encoding."""
    plan = lz.get_lazy_plan(spec.p)
    batch = X.shape[1:]
    flat = lambda c: c.astype(jnp.float32).reshape(N_DIGITS, -1)
    out = tuple(
        lz.canonicalize(plan, flat(c)).reshape((N_DIGITS,) + batch) for c in (X, Y, Z)
    )
    return out
