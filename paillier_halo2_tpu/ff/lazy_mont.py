"""Lazy signed Montgomery arithmetic — the round-3 speed-of-light path for
the fused point kernels (SURVEY.md section 7, hard part #1; VERDICT item 3).

Why: the round-2 fused point-add kernel normalizes after EVERY field op —
a Kogge-Stone carry-lookahead plus conditional subtract per mont_mul, and
one more per add/sub. On-chip profiling (round 3) showed the kernel compute
bound at ~6.3 M adds/s while the standalone HBM-bound mulmod does 200 M/s:
the carry machinery, not the multiplies, is the wall.

Here field elements inside a kernel are SIGNED base-256 digit rows in f32:

    x  =  sum_i d_i * 256^i,   d_i integer, |d_i| <= ~520

and NO op fully normalizes — there is no carry-lookahead anywhere. Every op
keeps exact integer semantics in f32 (all intermediates below 2^24) and
carries two static bounds, checked at trace time by the `LV` wrapper:

    digit bound   d_i in [dlo, dhi]   (f32-exactness: 32*Da*Db + 4.2M < 2^24)
    value bound   |v(x)| <= V*p       (REDC capacity: Va*Vb <= ~22, in p^2)

The enabling identity — "top-carry folding": for a digit vector y of
32 + k rows whose value is known to satisfy |v(y)| <= c*R (R = 2^256), two
base-256 folds leave rows 0..31 with digits in [-2, 257] and rows 32..33
holding a combined integer e = y32 + 256*y33 that must lie in the tiny range
(-1.008 - c, c + 0.008) — because rows 0..31 can only represent values in
(-0.008R, 1.008R). Since e's weight is R = 256 * 256^31, adding 256*e to
digit 31 re-encodes the exact same value in 32 rows. No carry chain, no
mod-p fudge, value preserved exactly. lmul applies the same argument twice
(low half: c_lo = value(u[0:32])/R is an integer in {0,1} because REDC makes
u divisible by R; top: e in {-1,0}).

ops (shapes (32, B) f32 unless noted):
  compress(x_ext, vbound)  the fold above; x_ext has >= 34 rows.
  lmul(a, b)    Montgomery product a*b*R^-1 (mod p), unnormalized:
                schoolbook via 32 shifted VPU FMAs; m = trunc_R(mu*t) via one
                bf16 MXU dot over three signed byte planes, folded thrice;
                u = t + m*p (second bf16 dot) over 67 rows; compress + c_lo.
                Out: digits in [-259, 258], |v| <= (0.189*Va*Vb + 1.01) p.
  lreduce(x)    partial reduction: q = round(v(x)/p) estimated in f32 from
                the top 8 rows (error < 1e-4; only |v - qp| <= 0.51p is
                needed, not exactness), subtract q*p_digits, compress.
                Out: digits in [-259, 258], |v| <= 0.51 p.
  canonicalize  full normalization to uint32 digits in [0, p) — pipeline
                exits only, never hot loops.

Exact-zero propagation: all-zero digit vectors stay all-zero through every
op (every correction term vanishes on zero input), so the Jacobian-infinity
encoding Z == 0 survives the lazy pipeline and mask tests stay exact.

Performance replacement for the per-op normalization in ec/pallas_point.py;
reference analog: halo2curves' 4x64 Montgomery arithmetic [dep]
(SURVEY.md section 2.2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field_jax import FieldSpec
from .limbs import DIGIT_BITS, N_DIGITS

assert DIGIT_BITS == 8 and N_DIGITS == 32
_ND = N_DIGITS


@functools.lru_cache(maxsize=None)
def get_lazy_plan(p: int) -> "LazyPlan":
    return LazyPlan(p)


class LazyPlan:
    """Per-field constants, host numpy (consumable by XLA and Pallas)."""

    def __init__(self, p: int):
        from .pallas_mulmod import _plan_host

        self.p = p
        self.p_over_R = p / 2.0**256  # 0.189 for BN254 Fq/Fr
        conv = _plan_host(p, "conv")
        self.mumat3 = np.asarray(conv["mumat3"])  # (32, 96) bf16
        self.pmat2 = np.asarray(conv["pmat2"])  # (64, 64) bf16
        spec = FieldSpec(p, "lazy")
        self.spec = spec
        self.pdig = np.asarray(spec.p_digits, np.float32).reshape(_ND, 1)
        one = [(spec.r_mod_p >> (8 * i)) & 0xFF for i in range(_ND)]
        self.one_dig = np.asarray(one, np.float32).reshape(_ND, 1)
        # q-estimate weights 256^i/p for the top 8 rows
        self.q_rows = 8
        self.qw = np.asarray(
            [256.0**i / p for i in range(_ND - self.q_rows, _ND)], np.float32
        ).reshape(self.q_rows, 1)

    def consts(self):
        """jnp tuple in the order the body functions expect:
        (mumat3, pmat2, pdig, qw, cw)."""
        return (
            jnp.asarray(self.mumat3),
            jnp.asarray(self.pmat2),
            jnp.asarray(self.pdig),
            jnp.asarray(self.qw),
            jnp.asarray(_CW_NP),
        )


# c_lo weights: 256^(i-32), rows 20..31 — exact powers of two, field-free
_C_ROWS = 12
_CW_NP = np.asarray(
    [256.0 ** (i - _ND) for i in range(_ND - _C_ROWS, _ND)], np.float32
).reshape(_C_ROWS, 1)


def _bf16dot(m, x):
    return jax.lax.dot_general(
        m, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def fold(x):
    """One signed base-256 fold. The top row's carry-out is dropped — only
    call on arrays padded so that carry is provably zero, or on values
    consumed mod 256^rows (the m-stage)."""
    hi = jnp.floor(x * (1.0 / 256.0))
    lo = x - 256.0 * hi
    return lo + jnp.pad(hi[:-1], [(1, 0), (0, 0)])


def compress(x_ext):
    """(32+k, B) f32 (k >= 2, |digits| <= 2^16, top rows sized so no carry
    escapes two folds) -> (32, B) with digits [-2,257] + 256*e at row 31,
    value preserved EXACTLY. e's smallness is the caller's value-bound
    obligation (see module docstring); the LV wrapper asserts it."""
    y = fold(fold(x_ext))
    e = y[_ND] + 256.0 * y[_ND + 1] if y.shape[0] > _ND + 1 else y[_ND]
    res = y[:_ND]
    res = res + jnp.pad(256.0 * e[None, :], [(_ND - 1, 0), (0, 0)])
    return res


def lmul(consts, a, b):
    """Lazy Montgomery product; consts = LazyPlan.consts()."""
    mumat3, pmat2 = consts[0], consts[1]
    B = a.shape[-1]
    # schoolbook digit product on rows 0..62; 4 extra zero rows so the three
    # u-folds never drop a carry (u pads to 67 rows total)
    t = jnp.zeros((2 * _ND + 3, B), jnp.float32)
    for i in range(_ND):
        t = t + jnp.pad(a[i][None, :] * b, [(i, _ND + 3 - i), (0, 0)])

    # m = trunc_R(mu * t): three signed byte planes of t[:32] (floor-based,
    # exact for signed digits), one bf16 MXU dot, three mod-R folds
    tl = t[:_ND]
    p1f = jnp.floor(tl * (1.0 / 256.0))
    p0 = tl - 256.0 * p1f
    p2 = jnp.floor(p1f * (1.0 / 256.0))
    p1 = p1f - 256.0 * p2
    planes = jnp.concatenate([p0, p1, p2], axis=0).astype(jnp.bfloat16)
    mraw = _bf16dot(mumat3, planes)  # (32, B), |.| < 2^23
    m = fold(fold(fold(mraw)))  # digits in [-1, 257]; value mod R is enough

    mh = jnp.floor(m * (1.0 / 256.0))  # in {-1, 0, 1}
    ml = m - 256.0 * mh  # in [0, 255]
    mplanes = jnp.concatenate([ml, mh], axis=0).astype(jnp.bfloat16)
    mp = _bf16dot(pmat2, mplanes)  # (64, B), |.| <= 4.2M

    u = t + jnp.pad(mp, [(0, 3), (0, 0)])  # (67, B), |.| < 2^24
    u = fold(fold(fold(u)))  # digits in [-2, 257], value preserved exactly

    # two exact corrections replace the carry chain (module docstring):
    #  - value(u[0:32]) is an integer multiple of R (REDC makes u divisible
    #    by R); with digits in [-2, 257] that multiple c_lo is in {0, 1},
    #    recovered exactly from the top 12 low rows in f32 (omitted rows
    #    contribute < 2^-60, f32 rounding < 1e-4).
    #  - e = u64 + 256*u65 + 65536*u66 is an integer in {-1, 0} by the value
    #    bound; its weight 256^64 = (256*256^31)*R lands as 256*e at row 31.
    c_lo = jnp.round(
        jnp.sum(u[_ND - _C_ROWS : _ND] * consts[4], axis=0, keepdims=True)
    )
    e = u[2 * _ND] + 256.0 * u[2 * _ND + 1] + 65536.0 * u[2 * _ND + 2]
    res = u[_ND : 2 * _ND]
    res = res + jnp.pad(256.0 * e[None, :], [(_ND - 1, 0), (0, 0)])
    res = res + jnp.pad(c_lo, [(0, _ND - 1), (0, 0)])
    return res


def lreduce(consts, x):
    """Partial reduction to |v| <= 0.51p. x: (32, B), digits |d| <= ~2^13,
    |v| <= ~16p. consts = LazyPlan.consts()."""
    pdig, qw = consts[2], consts[3]
    q_rows = qw.shape[0]
    q = jnp.round(jnp.sum(x[_ND - q_rows :] * qw, axis=0, keepdims=True))
    y = x - q * pdig
    return compress(jnp.pad(y, [(0, 2), (0, 0)]))


def to_lazy(d_u32):
    return d_u32.astype(jnp.int32).astype(jnp.float32)


def canonicalize(plan: LazyPlan, x) -> jnp.ndarray:
    """Lazy signed f32 digits -> canonical uint32 digits in [0, p).
    XLA path for pipeline exits (not inside hot kernels)."""
    from .pallas_mulmod import _carry_normalize, _sub_digits

    consts = plan.consts()
    y = lreduce(consts, x)  # |v| <= 0.51p, digits in [-259, 258]
    y = y + jnp.asarray(plan.pdig)  # v in (0.49p, 1.51p) > 0
    yi = y.astype(jnp.int32)
    pos = jnp.where(yi > 0, yi, 0).astype(jnp.uint32)
    neg = jnp.where(yi < 0, -yi, 0).astype(jnp.uint32)
    a = _carry_normalize(pos, 1 << 10)
    bneg = _carry_normalize(neg, 1 << 10)
    d, _ = _sub_digits(a, bneg)  # v > 0 => no global borrow
    pvec = jnp.asarray(plan.pdig.astype(np.uint32))
    diff, under_p = _sub_digits(d, jnp.broadcast_to(pvec, d.shape))
    return jnp.where(under_p, d, diff)


# ---------------------------------------------------------------------------
# Trace-time bound tracking
# ---------------------------------------------------------------------------

# digit budget: 32*Da*Db (schoolbook) + 4.3M (mp rows) must stay under 2^24
_MUL_DIGIT_BUDGET = (1 << 24) - 4_300_000
# value budget: |va*vb| + |v(m)*p| < 256^64; in units of p^2 with
# p/R = 0.189 for BN254: va*vb <= (1 - 0.189*1.01)/0.189^2 ~ 22.6
_VMAX_CAP = 22.0


class LV:
    """Lazy value: array + static (digit_lo, digit_hi, |value|/p bound).
    Formula code uses these wrappers so bound violations fail at trace."""

    __slots__ = ("a", "dlo", "dhi", "v")

    def __init__(self, a, dlo: float, dhi: float, v: float):
        self.a = a
        self.dlo = float(dlo)
        self.dhi = float(dhi)
        self.v = float(v)

    @property
    def dmax(self) -> float:
        return max(-self.dlo, self.dhi)

    def __repr__(self):
        return f"LV(d in [{self.dlo:.0f},{self.dhi:.0f}], |v|<={self.v:.2f}p)"


def lv_canonical(a) -> LV:
    """Wrap canonical digits (uint-valued, in [0,255], value < p)."""
    return LV(a, 0, 255, 1.0)


def lv_mul(plan: LazyPlan, consts, x: LV, y: LV) -> LV:
    assert 32 * x.dmax * y.dmax < _MUL_DIGIT_BUDGET, f"digit budget: {x} * {y}"
    assert x.v * y.v <= _VMAX_CAP, f"value capacity: {x} * {y}"
    out = lmul(consts, x.a, y.a)
    v_out = plan.p_over_R * x.v * y.v + 1.01
    # digits [-2,257], plus 256*e (e in {-1,0}) at row 31, c_lo in {0,1}
    # at row 0 => [-258, 258]
    return LV(out, -258, 258, v_out)


def lv_add(x: LV, y: LV) -> LV:
    return LV(x.a + y.a, x.dlo + y.dlo, x.dhi + y.dhi, x.v + y.v)


def lv_sub(x: LV, y: LV) -> LV:
    return LV(x.a - y.a, x.dlo - y.dhi, x.dhi - y.dlo, x.v + y.v)


def lv_reduce(plan: LazyPlan, consts, x: LV) -> LV:
    qmax = x.v + 1
    assert x.dmax + qmax * 255 < (1 << 14), f"lreduce digit overflow: {x}"
    # compress with |v| <= 0.51p => e in {-1, 0} => digits [-258, 257]
    return LV(lreduce(consts, x.a), -258, 257, 0.52)


def lv_select(mask, x: LV, y: LV) -> LV:
    return LV(
        jnp.where(mask, x.a, y.a),
        min(x.dlo, y.dlo),
        max(x.dhi, y.dhi),
        max(x.v, y.v),
    )


def lv_zero_like(x: LV) -> LV:
    return LV(jnp.zeros_like(x.a), 0, 0, 0.0)


# ---------------------------------------------------------------------------
# Standalone lazy mulmod kernel (north-star throughput metric)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def mont_mul_lazy_pallas(spec: FieldSpec, a, b, block: int = 1024,
                         interpret: bool = False):
    """Batched lazy Montgomery product with int16 digit I/O — the storage
    format of the hot point pipeline (ec/lazy_point.py). 96 B/lane of HBM
    traffic instead of the canonical kernel's 384 B, and no carry chain.
    a, b: (32, N) int16 with digits in [-520, 520]; N % block == 0.
    Output digits in [-258, 258]; value == a*b*R^-1 + k*p for |k| small."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = get_lazy_plan(spec.p)
    consts = plan.consts()
    nd = N_DIGITS
    n = a.shape[1]
    assert a.shape == b.shape == (nd, n) and n % block == 0

    def kernel(a_ref, b_ref, *refs):
        cs = tuple(r[:] for r in refs[:-1])
        out_ref = refs[-1]
        out_ref[:] = lmul(cs, a_ref[:].astype(jnp.float32),
                          b_ref[:].astype(jnp.float32)).astype(jnp.int16)

    data = pl.BlockSpec((nd, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspecs = [
        pl.BlockSpec(tuple(c.shape), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for c in consts
    ]
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[data, data] + cspecs,
        out_specs=data,
        out_shape=jax.ShapeDtypeStruct((nd, n), jnp.int16),
        interpret=interpret,
    )(a, b, *consts)
