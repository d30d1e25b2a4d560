"""Pallas TPU kernel for batched Montgomery multiplication — the
speed-of-light mulmod (SURVEY.md section 7, hard part #1).

Strategy: one kernel per (32, BLOCK)-lane tile, entirely in VMEM:
- schoolbook digit product via the MXU: per-lane outer product (1024, BLOCK)
  contracted against a constant 0/1 anti-diagonal matrix;
- whole-R Montgomery REDC with constant mu/p convolution matrices;
- exact carry propagation via an unrolled Kogge-Stone (no associative_scan —
  Mosaic-friendly manual log-depth shifts).

Round-2 speedups, driven by on-chip measurement (the VPU's elementwise
throughput, not the MXU, is the wall — materializing and byte-splitting the
(1024, B) outer product costs more than all three REDC dots):

  conv (default): no outer product at all — the schoolbook digit product is
         32 shifted VPU FMAs in f32 (integers < 2^24, exact), and only the
         small constant-operand REDC convolutions ride the MXU, against
         byte planes of the UNNORMALIZED accumulators. Carries are cheap
         base-256 folds + one small Kogge-Stone. ~8x less VMEM per tile.
  int8 : byte-split product planes, operands centered to [-128,127], int32
         accumulation, `128 * rowsum` corrections folded in; byte matrices
         split into nibble pairs. 2x bf16 MXU rate.
  bf16 : byte-split product planes cast to bf16 (bytes are exact), f32
         accumulation.
  f32  : round-1 behavior (XLA-emulated exact f32 dots) — fallback.

In every impl the mu-stage consumes the unnormalized product t as byte
planes against shifted copies of the mu matrix (t' == t mod R, and any
representative works there), instead of normalizing t first.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field_jax import FieldSpec
from .limbs import DIGIT_BITS, DIGIT_MASK, N_DIGITS


def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


BLOCK = _env_int("PAILLIER_TPU_MULMOD_BLOCK", 1024)  # conv body: small VMEM


def dot_impl() -> str:
    return os.environ.get("PAILLIER_TPU_DOT", "conv")


# ---------------------------------------------------------------------------
# Carry machinery (identical math to ff/field_jax.py, unrolled for Mosaic)
# ---------------------------------------------------------------------------


def _shift_up(c):
    return jnp.pad(c[0 : c.shape[0] - 1], [(1, 0), (0, 0)])


def _kogge_stone(g, pr):
    """Unrolled carry-lookahead: c[i+1] = g[i] | (pr[i] & c[i])."""
    n = g.shape[0]
    step = 1
    while step < n:
        g_prev = jnp.pad(g[0 : n - step], [(step, 0), (0, 0)])
        p_prev = jnp.pad(pr[0 : n - step], [(step, 0), (0, 0)], constant_values=0)
        g = g | (pr & g_prev)
        pr = pr & p_prev
        step *= 2
    return _shift_up(g)


def _carry_normalize(d, max_digit):
    bound = max_digit
    while bound > 2 * DIGIT_MASK + 1:
        d = (d & DIGIT_MASK) + _shift_up(d >> DIGIT_BITS)
        bound = DIGIT_MASK + (bound >> DIGIT_BITS)
    x = d & DIGIT_MASK
    y = _shift_up(d >> DIGIT_BITS)
    s = x + y
    carries = _kogge_stone(
        (s > DIGIT_MASK).astype(jnp.uint32), (s == DIGIT_MASK).astype(jnp.uint32)
    )
    return (s + carries) & DIGIT_MASK


def _fold_f32(u):
    """One base-256 fold on f32 digit rows: digit bound b -> 255 + b/256.
    Drops the top row's carry-out (reduces the value mod 256^rows)."""
    hi = jnp.floor(u * (1.0 / 256.0))
    lo = u - 256.0 * hi
    return lo + jnp.pad(hi[:-1], [(1, 0), (0, 0)])


def _sub_digits(a, b):
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    borrows = _kogge_stone((d < 0).astype(jnp.uint32), (d == 0).astype(jnp.uint32))
    r = d - borrows.astype(jnp.int32)
    out = jnp.where(r < 0, r + (1 << DIGIT_BITS), r).astype(jnp.uint32)
    last = d.shape[0] - 1  # positive static index (negative lowers to dynamic_slice)
    top = d[last] - borrows[last].astype(jnp.int32)
    return out, (top < 0)


# ---------------------------------------------------------------------------
# Constant matrices for the three-dot REDC (host precompute, per field+impl)
# ---------------------------------------------------------------------------


def _gather_mat(n: int, out_len: int) -> np.ndarray:
    """t[k] = sum_{i+j=k} a_i b_j as M @ vec(outer): M[k, i*n+j] = [i+j == k]."""
    m = np.zeros((out_len, n * n), np.int64)
    for i in range(n):
        for j in range(n):
            if i + j < out_len:
                m[i + j, i * n + j] = 1
    return m


def _shifted_const_mat(digits: np.ndarray, shift: int, out_len: int, in_len: int) -> np.ndarray:
    """M[k, i] = digits[k - i - shift] (0 outside range)."""
    m = np.zeros((out_len, in_len), np.int64)
    nd = len(digits)
    for k in range(out_len):
        for i in range(in_len):
            d = k - i - shift
            if 0 <= d < nd:
                m[k, i] = int(digits[d])
    return m


@functools.lru_cache(maxsize=None)
def _plan_host(p: int, impl: str) -> dict:
    """All per-(field, impl) constant arrays, as host numpy.

    tmat : (63, 1024)  0/1 anti-diagonal gather
    mumat: (32, 128)   [mu | mu<<1 | mu<<1 | mu<<2] for byte planes
                       [lo&255, lo>>8, hi&255, hi>>8] of the raw product accs
    pmat : (63, 32)    p[k-i]
    plus int8 nibble-stacked forms and 128*rowsum correction columns.
    """
    nd = N_DIGITS
    spec = FieldSpec(p, "plan")
    mu = spec.mu_digits
    pd = spec.p_digits
    tmat = _gather_mat(nd, 2 * nd - 1)
    mumat = np.concatenate(
        [
            _shifted_const_mat(mu, 0, nd, nd),  # lo_acc & 255       (2^0 plane)
            _shifted_const_mat(mu, 1, nd, nd),  # lo_acc >> 8        (2^8 plane)
            _shifted_const_mat(mu, 1, nd, nd),  # hi_acc & 255       (2^8 plane)
            _shifted_const_mat(mu, 2, nd, nd),  # hi_acc >> 8        (2^16 plane)
        ],
        axis=1,
    )  # (32, 128)
    pmat = _shifted_const_mat(pd, 0, 2 * nd - 1, nd)  # (63, 32)
    out = {}
    if impl == "conv":
        # schoolbook product via 32 shifted VPU FMAs (no tmat); REDC dots on
        # byte planes of the unnormalized accumulators, all bf16-exact.
        out["mumat3"] = np.concatenate(
            [
                _shifted_const_mat(mu, 0, nd, nd),
                _shifted_const_mat(mu, 1, nd, nd),
                _shifted_const_mat(mu, 2, nd, nd),
            ],
            axis=1,
        ).astype(jnp.bfloat16)  # (32, 96)
        # 2*nd output rows, NOT 2*nd-1: v(m) may slightly exceed R (folded
        # digits reach 256), so the shift-1 plane's top term mh[31]*p[31]
        # lands in row 63 — truncating it drops value (caught by fuzzing).
        out["pmat2"] = np.concatenate(
            [
                _shifted_const_mat(pd, 0, 2 * nd, nd),
                _shifted_const_mat(pd, 1, 2 * nd, nd),
            ],
            axis=1,
        ).astype(jnp.bfloat16)  # (64, 64)
        out["p_col"] = np.asarray(pd, np.uint32).reshape(-1, 1)
        return out
    if impl == "int8":
        out["tmat"] = tmat.astype(np.int8)
        out["t_corr"] = (128 * tmat.sum(axis=1)).astype(np.int32).reshape(-1, 1)
        out["mumat"] = np.concatenate([mumat & 0xF, mumat >> 4], axis=0).astype(np.int8)
        out["mu_corr"] = (128 * mumat.sum(axis=1)).astype(np.int32).reshape(-1, 1)
        out["pmat"] = np.concatenate([pmat & 0xF, pmat >> 4], axis=0).astype(np.int8)
        out["p_corr"] = (128 * pmat.sum(axis=1)).astype(np.int32).reshape(-1, 1)
    elif impl == "bf16":
        # bytes are integers < 2^8: exactly representable in bf16
        out["tmat"] = tmat.astype(jnp.bfloat16)
        out["mumat"] = mumat.astype(jnp.bfloat16)
        out["pmat"] = pmat.astype(jnp.bfloat16)
    else:  # f32
        out["tmat"] = tmat.astype(np.float32)
        out["mumat"] = mumat.astype(np.float32)
        out["pmat"] = pmat.astype(np.float32)
    out["p_col"] = np.asarray(pd, np.uint32).reshape(-1, 1)
    return out


class MulPlan:
    """Bundles the constant arrays + the in-kernel mont-mul body for one
    (field, dot-impl) pair. Kernels receive `arrays` as trailing VMEM refs
    (constant index map) and call `body(a, b, *const_vals)`."""

    def __init__(self, spec: FieldSpec, impl: str | None = None):
        self.spec = spec
        self.impl = impl or dot_impl()
        assert self.impl in ("conv", "int8", "bf16", "f32"), self.impl
        h = _plan_host(spec.p, self.impl)
        self.names = list(h.keys())
        self.arrays = [np.asarray(h[k]) for k in self.names]

    # -- dot helpers --------------------------------------------------------

    def _cast_operand(self, x_u32):
        """byte-valued uint32 -> MXU operand dtype (centered for int8)."""
        if self.impl == "int8":
            return (x_u32.astype(jnp.int32) - 128).astype(jnp.int8)
        if self.impl == "bf16":
            return x_u32.astype(jnp.int32).astype(jnp.bfloat16)
        return x_u32.astype(jnp.int32).astype(jnp.float32)

    def _dot(self, mat, x):
        acc = jnp.int32 if self.impl == "int8" else jnp.float32
        out = jax.lax.dot_general(
            mat, x, (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        return out if self.impl == "int8" else out.astype(jnp.int32)

    def body(self, a, b, *consts):
        """Montgomery product on (32, B) byte-digit uint32 tiles, output in
        [0, p) normalized digits. REDC: t = a*b (as lo/hi byte-plane accs),
        m = trunc32(mu * t) via shifted-matrix byte planes, u = t + m*p,
        result = u >> 256, minus p if >= p."""
        if self.impl == "conv":
            return self._body_conv(a, b, *consts)
        c = dict(zip(self.names, consts))
        nd = N_DIGITS
        B = a.shape[1]
        prod = (a[:, None, :] * b[None, :, :]).reshape(nd * nd, B)  # < 2^16
        lohi = self._cast_operand(
            jnp.concatenate([prod & DIGIT_MASK, prod >> DIGIT_BITS], axis=1)
        )
        acc = self._dot(c["tmat"], lohi)  # (63, 2B) int32
        if self.impl == "int8":
            acc = acc + c["t_corr"]
        lo_acc, hi_acc = acc[:, :B], acc[:, B:]  # each < 32*255 = 8160

        # mu-stage: m = trunc32(mu * t) — t enters as four byte planes of the
        # UNNORMALIZED accs (any representative == t mod R is valid here).
        la, ha = lo_acc[:nd].astype(jnp.uint32), hi_acc[:nd].astype(jnp.uint32)
        planes = jnp.concatenate(
            [la & DIGIT_MASK, la >> DIGIT_BITS, ha & DIGIT_MASK, ha >> DIGIT_BITS],
            axis=0,
        )  # (128, B), bytes
        mraw = self._dot(c["mumat"], self._cast_operand(planes))
        if self.impl == "int8":
            mraw = mraw[:nd] + (mraw[nd:] << 4) + c["mu_corr"]
        m = _carry_normalize(mraw.astype(jnp.uint32), 128 * 255 * 255)  # (32, B)

        mp = self._dot(c["pmat"], self._cast_operand(m))
        if self.impl == "int8":
            mp = mp[: 2 * nd - 1] + (mp[2 * nd - 1 :] << 4) + c["p_corr"]

        # u = t + m*p: zero mod R by construction; result = u / R.
        u = (
            lo_acc.astype(jnp.uint32)
            + (hi_acc.astype(jnp.uint32) << DIGIT_BITS)
            + mp.astype(jnp.uint32)
        )  # (63, B) < 2^24
        u = jnp.pad(u, [(0, 1), (0, 0)])
        u = _carry_normalize(u, 1 << 24)
        res = u[nd:]
        diff, under = _sub_digits(res, jnp.broadcast_to(c["p_col"], (nd, B)))
        return jnp.where(under, res, diff)

    def _body_conv(self, a, b, *consts):
        """f32-convolution variant: no outer-product materialization, no tmat
        dot. VPU does t[k] = sum_i a_i*b[k-i] as 32 shifted FMAs entirely in
        f32 (all values integers < 2^24, exact); the two REDC convolutions
        stay on the MXU against byte planes of the unnormalized
        accumulators; carries resolve via cheap base-256 folds + one small
        Kogge-Stone. Measured ~15% faster than the outer+dot bodies and uses
        ~8x less VMEM (no (1024, B) tile), so larger BLOCKs fit."""
        c = dict(zip(self.names, consts))
        nd = N_DIGITS
        B = a.shape[1]
        af = a.astype(jnp.int32).astype(jnp.float32)
        bf = b.astype(jnp.int32).astype(jnp.float32)
        t = jnp.zeros((2 * nd, B), jnp.float32)
        for i in range(nd):
            t = t + jnp.pad(af[i][None, :] * bf, [(i, nd - i), (0, 0)])
        t = t[: 2 * nd - 1]  # digits < 32 * 255^2 < 2^21

        # m = trunc32(mu * t~) on 3 byte planes of the unnormalized t[:32]
        tl = t[:nd]
        p1 = jnp.floor(tl * (1.0 / 256.0))
        p0 = tl - 256.0 * p1
        p2 = jnp.floor(p1 * (1.0 / 256.0))
        p1 = p1 - 256.0 * p2
        planes = jnp.concatenate([p0, p1, p2], axis=0).astype(jnp.bfloat16)
        mraw = self._f32dot(c["mumat3"], planes)  # (32, B) < 2^23

        # fold m to digits <= 256 (value mod R preserved; v(m) < 1.004*R)
        m = _fold_f32(_fold_f32(_fold_f32(mraw)))
        mh = jnp.floor(m * (1.0 / 256.0))
        ml = m - 256.0 * mh
        mplanes = jnp.concatenate([ml, mh], axis=0).astype(jnp.bfloat16)
        mp = self._f32dot(c["pmat2"], mplanes)  # (64, B) < 2^22

        # u = t + m*p == 0 mod R; res = u / R < 1.26p -> one conditional sub
        u = _fold_f32(_fold_f32(jnp.pad(t, [(0, 1), (0, 0)]) + mp))
        ui = u.astype(jnp.int32)  # digits < 255 + 66
        lo = ui & 0xFF
        cr = ui >> 8  # 0/1
        s = lo + jnp.pad(cr[:-1], [(1, 0), (0, 0)])
        carries = _kogge_stone(
            (s > 255).astype(jnp.uint32), (s == 255).astype(jnp.uint32)
        )
        full = (s.astype(jnp.uint32) + carries) & DIGIT_MASK
        res = full[nd:]
        diff, under = _sub_digits(res, jnp.broadcast_to(c["p_col"], (nd, B)))
        return jnp.where(under, res, diff)

    @staticmethod
    def _f32dot(m, x):
        return jax.lax.dot_general(
            m, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # -- pallas plumbing ----------------------------------------------------

    def const_values(self):
        return [jnp.asarray(a) for a in self.arrays]

    def const_specs(self):
        # all const arrays are 2-D; replicate to every grid step
        return [
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for a in self.arrays
        ]


@functools.lru_cache(maxsize=None)
def _get_plan_cached(p: int, impl: str) -> MulPlan:
    return MulPlan(FieldSpec(p, "plan"), impl)


def get_plan(p: int, impl: str | None = None) -> MulPlan:
    return _get_plan_cached(p, impl or dot_impl())


def _mont_mul_body(a, b, plan: MulPlan, *consts):
    """Compatibility shim used by ec/pallas_point.py."""
    return plan.body(a, b, *consts)


def _kernel(plan, a_ref, b_ref, *refs):
    out_ref = refs[-1]
    const_refs = refs[:-1]
    out_ref[:] = plan.body(a_ref[:], b_ref[:], *(r[:] for r in const_refs))


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def mont_mul_pallas(
    spec: FieldSpec,
    a: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
    impl: str | None = None,
):
    """Batched Montgomery product on (N_DIGITS, N) digit arrays via Pallas.
    N must be a multiple of BLOCK (pad on the caller side)."""
    nd = spec.n_digits
    n = a.shape[1]
    assert a.shape == b.shape == (nd, n)
    assert n % BLOCK == 0, f"pad batch to a multiple of {BLOCK}"
    plan = get_plan(spec.p, impl)
    data = pl.BlockSpec((nd, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, plan),
        grid=(n // BLOCK,),
        in_specs=[data, data] + plan.const_specs(),
        out_specs=data,
        out_shape=jax.ShapeDtypeStruct((nd, n), jnp.uint32),
        interpret=interpret,
    )(a, b, *plan.const_values())
