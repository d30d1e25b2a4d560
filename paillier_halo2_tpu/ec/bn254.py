"""Batched BN254 G1 arithmetic on Fq digit vectors (Jacobian coordinates) —
device counterpart of halo2curves' G1 (SURVEY.md section 2.2). All ops are
fully vectorized over a trailing batch axis with digit-first layout
(N_DIGITS, *batch); infinity is encoded as Z == 0 and handled with select
masks (no data-dependent branches — jit/shard_map friendly).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import field_jax as f
from ..ff.limbs import N_DIGITS

SPEC = f.FQ

JPoint = tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (X, Y, Z) Montgomery


def _mul(a, b):
    return f.mont_mul(SPEC, a, b)


def _sqr(a):
    return f.mont_mul(SPEC, a, a)


def _add(a, b):
    return f.add(SPEC, a, b)


def _sub(a, b):
    return f.sub(SPEC, a, b)


def _is_zero(a) -> jnp.ndarray:
    return jnp.all(a == 0, axis=0)


def _sel(mask, a, b):
    """Per-batch-element select between two digit arrays."""
    return jnp.where(mask, a, b)


def point_select(mask, p: JPoint, q: JPoint) -> JPoint:
    return tuple(_sel(mask, pc, qc) for pc, qc in zip(p, q))


def infinity_like(p: JPoint) -> JPoint:
    one = jnp.broadcast_to(
        jnp.asarray(f.pack_ints([SPEC.r_mod_p])[:, 0]).reshape((N_DIGITS,) + (1,) * (p[0].ndim - 1)),
        p[0].shape,
    )
    return (one, one, jnp.zeros_like(p[2]))


# Fused Pallas kernel dispatch (see ec/pallas_point.py): on TPU, point adds
# over batches at least this large run as one fused kernel instead of ~11-16
# separate mulmod launches with HBM round-trips between them.
PALLAS_POINT_MIN_LANES = 1024


def _pallas_flatten(arrays, batch):
    import numpy as onp

    lanes = int(onp.prod(batch))
    from .pallas_point import BLOCK

    pad = (-lanes) % BLOCK
    out = []
    for a in arrays:
        flat = jnp.broadcast_to(a, (N_DIGITS,) + batch).reshape(N_DIGITS, lanes)
        out.append(jnp.pad(flat, [(0, 0), (0, pad)]) if pad else flat)
    return out, lanes


def _use_pallas_points(batch) -> bool:
    import numpy as onp

    return f._use_pallas() and int(onp.prod(batch)) >= PALLAS_POINT_MIN_LANES


@jax.jit
def pdouble(p: JPoint) -> JPoint:
    """dbl-2009-l (a=0): correct for infinity too (Z stays 0)."""
    X, Y, Z = p
    A = _sqr(X)
    B = _sqr(Y)
    C = _sqr(B)
    t = _sqr(_add(X, B))
    D = _sub(_sub(t, A), C)
    D = _add(D, D)  # 2*((X+B)^2 - A - C)
    E = _add(_add(A, A), A)  # 3A
    F = _sqr(E)
    X3 = _sub(F, _add(D, D))
    C8 = _add(C, C)
    C8 = _add(C8, C8)
    C8 = _add(C8, C8)
    Y3 = _sub(_mul(E, _sub(D, X3)), C8)
    YZ = _mul(Y, Z)
    Z3 = _add(YZ, YZ)
    return (X3, Y3, Z3)


@functools.partial(jax.jit, static_argnames=("nodouble",))
def padd(p: JPoint, q: JPoint, nodouble: bool = False) -> JPoint:
    """General Jacobian addition with all edge cases resolved by masks:
    P+inf, inf+Q, P+P (falls through to double), P+(-P) (infinity).

    nodouble=True is a Pallas-path contract: the caller guarantees no lane
    ever hits P == Q or P == -Q (distinct-point accumulation, e.g. disjoint
    partial sums of distinct SRS bases); the kernel then skips the 7-mul
    doubling branch. A violated contract degrades to Z3 == 0 (infinity),
    never a wrong finite point. The XLA fallback keeps the full branch."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    batch = jnp.broadcast_shapes(X1.shape[1:], X2.shape[1:])
    if _use_pallas_points(batch):
        from .pallas_point import padd_pallas

        flat, lanes = _pallas_flatten([X1, Y1, Z1, X2, Y2, Z2], batch)
        out = padd_pallas(SPEC, *flat, nodouble=nodouble)
        return tuple(c[:, :lanes].reshape((N_DIGITS,) + batch) for c in out)
    from ..utils.lean import compile_lean

    if compile_lean():
        # straight-line-program interpreter: ~2 s of XLA:CPU compile per
        # padd instance instead of ~35 s (see ec/slp.py); identical values.
        from . import slp

        br = slp.jacobian_branches(SPEC, X1, Y1, Z1, X2, Y2, Z2)
        h, r = br["h"], br["r"]
        generic = (br["X3"], br["Y3"], br["Z3"])
        double = (br["Xd"], br["Yd"], br["Zd"])
    else:
        z1z1 = _sqr(Z1)
        z2z2 = _sqr(Z2)
        u1 = _mul(X1, z2z2)
        u2 = _mul(X2, z1z1)
        s1 = _mul(Y1, _mul(Z2, z2z2))
        s2 = _mul(Y2, _mul(Z1, z1z1))
        h = _sub(u2, u1)
        r = _sub(s2, s1)

        hh = _sqr(h)
        hhh = _mul(h, hh)
        v = _mul(u1, hh)
        rr = _sqr(r)
        X3 = _sub(_sub(rr, hhh), _add(v, v))
        Y3 = _sub(_mul(r, _sub(v, X3)), _mul(s1, hhh))
        Z3 = _mul(_mul(Z1, Z2), h)
        generic = (X3, Y3, Z3)
        double = pdouble(p)

    h_zero = _is_zero(h)
    r_zero = _is_zero(r)
    p_inf = _is_zero(Z1)
    q_inf = _is_zero(Z2)

    res = point_select(h_zero & r_zero, double, generic)
    res = point_select(h_zero & ~r_zero & ~p_inf & ~q_inf, infinity_like(p), res)
    res = point_select(q_inf, p, res)
    res = point_select(p_inf, q, res)
    return res


@functools.partial(jax.jit, static_argnames=("nodouble",))
def padd_mixed(p: JPoint, q_affine: tuple[jnp.ndarray, jnp.ndarray], q_inf,
               nodouble: bool = False) -> JPoint:
    """Mixed addition: q given in affine Montgomery coords (Z2 == 1).
    madd-2007-bl shape, ~11 muls instead of ~16. `q_inf` is a batch mask.
    nodouble: see padd."""
    X1, Y1, Z1 = p
    X2, Y2 = q_affine
    batch = jnp.broadcast_shapes(X1.shape[1:], X2.shape[1:])
    if _use_pallas_points(batch):
        from .pallas_point import BLOCK, padd_mixed_pallas

        flat, lanes = _pallas_flatten([X1, Y1, Z1, X2, Y2], batch)
        qi = jnp.broadcast_to(q_inf, batch).reshape(lanes)
        pad = (-lanes) % BLOCK
        if pad:
            qi = jnp.pad(qi, (0, pad), constant_values=True)
        out = padd_mixed_pallas(SPEC, *flat, qi, nodouble=nodouble)
        return tuple(c[:, :lanes].reshape((N_DIGITS,) + batch) for c in out)
    from ..utils.lean import compile_lean

    if compile_lean():
        from . import slp

        br = slp.mixed_branches(SPEC, X1, Y1, Z1, X2, Y2)
        h, r = br["h"], br["r"]
        generic = (br["X3"], br["Y3"], br["Z3"])
        double = (br["Xd"], br["Yd"], br["Zd"])
    else:
        z1z1 = _sqr(Z1)
        u2 = _mul(X2, z1z1)
        s2 = _mul(Y2, _mul(Z1, z1z1))
        h = _sub(u2, X1)
        r = _sub(s2, Y1)

        hh = _sqr(h)
        hhh = _mul(h, hh)
        v = _mul(X1, hh)
        rr = _sqr(r)
        X3 = _sub(_sub(rr, hhh), _add(v, v))
        Y3 = _sub(_mul(r, _sub(v, X3)), _mul(Y1, hhh))
        Z3 = _mul(Z1, h)
        generic = (X3, Y3, Z3)
        double = pdouble(p)

    h_zero = _is_zero(h)
    r_zero = _is_zero(r)
    p_inf = _is_zero(Z1)

    res = point_select(h_zero & r_zero, double, generic)
    res = point_select(h_zero & ~r_zero & ~p_inf, infinity_like(p), res)
    one = infinity_like(p)[0]
    q_jac = (X2, Y2, _sel(q_inf, jnp.zeros_like(Z1), one))
    res = point_select(p_inf, q_jac, res)
    res = point_select(q_inf, p, res)
    return res


@jax.jit
def pack_points_dense(px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """(N_DIGITS, N) x 2 digit arrays -> (N, 16) uint32 dense rows: word k of
    a coordinate holds digits 4k..4k+3 little-endian; words 0-7 = X, 8-15 = Y.
    64-byte rows are the MSM gather currency — TPU gathers are per-index
    bound, so one row gather beats two digit-column gathers 4x wide."""
    alld = jnp.concatenate([px, py], axis=0)  # (64, N)
    w = alld.reshape(16, 4, -1)
    packed = w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)
    return packed.T  # (N, 16)


def _unpack_words_xla(w: jnp.ndarray) -> jnp.ndarray:
    """(8, L) packed words -> (32, L) digits (XLA fallback mirror of the
    in-kernel unpack in pallas_point.py)."""
    parts = [(w >> (8 * i)) & 0xFF for i in range(4)]
    return jnp.stack(parts, axis=1).reshape(4 * w.shape[0], w.shape[1])


@functools.partial(jax.jit, static_argnames=("nodouble",))
def padd_mixed_packed(p: JPoint, packed: jnp.ndarray, q_inf,
                      nodouble: bool = False) -> JPoint:
    """Mixed add with the affine operand in dense-packed ROW form
    (L, PACK_WORDS) — exactly what a row gather from pack_points_dense
    produces. On TPU the fused kernel transposes + unpacks in VMEM (no XLA
    relayout between gather and add); the XLA path unpacks first and reuses
    padd_mixed."""
    X1, Y1, Z1 = p
    lanes = X1.shape[1]
    assert packed.shape[0] == lanes and X1.ndim == 2
    if _use_pallas_points((lanes,)):
        from .pallas_point import BLOCK, padd_mixed_packed_pallas

        pad = (-lanes) % BLOCK
        if pad:
            X1, Y1, Z1 = (jnp.pad(c, [(0, 0), (0, pad)]) for c in (X1, Y1, Z1))
            packed = jnp.pad(packed, [(0, pad), (0, 0)])
            q_inf = jnp.pad(q_inf, (0, pad), constant_values=True)
        out = padd_mixed_packed_pallas(
            SPEC, X1, Y1, Z1, packed, q_inf, nodouble=nodouble
        )
        return tuple(c[:, :lanes] for c in out)
    X2 = _unpack_words_xla(packed.T[:8])
    Y2 = _unpack_words_xla(packed.T[8:])
    return padd_mixed(p, (X2, Y2), q_inf, nodouble=nodouble)


# -- host <-> device ---------------------------------------------------------


def pack_affine(points) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """List of host affine points (or None) -> Montgomery (X, Y, inf_mask)."""
    xs = [p[0] if p is not None else 0 for p in points]
    ys = [p[1] if p is not None else 0 for p in points]
    inf = np.array([p is None for p in points])
    R = (1 << 256) % SPEC.p
    xm = f.pack_ints([x * R % SPEC.p for x in xs])
    ym = f.pack_ints([y * R % SPEC.p for y in ys])
    return xm, ym, inf


def pack_jacobian(points) -> JPoint:
    """List of host affine points (or None) -> device Jacobian Montgomery."""
    xm, ym, inf = pack_affine(points)
    one = f.pack_ints([SPEC.r_mod_p] * len(points))
    z = np.where(inf[None, :], np.zeros_like(one), one)
    return (jnp.asarray(xm), jnp.asarray(ym), jnp.asarray(z))


def unpack_jacobian(p: JPoint):
    """Device Jacobian -> list of host affine points (or None)."""
    X, Y, Z = (np.asarray(c) for c in p)
    xs = f.unpack_ints(f.from_mont(SPEC, jnp.asarray(X)))
    ys = f.unpack_ints(f.from_mont(SPEC, jnp.asarray(Y)))
    zs = f.unpack_ints(f.from_mont(SPEC, jnp.asarray(Z)))
    out = []
    q = SPEC.p
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
            continue
        zi = pow(z, -1, q)
        zi2 = zi * zi % q
        out.append((x * zi2 % q, y * zi2 * zi % q))
    return out
