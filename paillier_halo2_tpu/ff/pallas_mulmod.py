"""Pallas TPU kernel for batched Montgomery multiplication — the
speed-of-light mulmod (SURVEY.md section 7, hard part #1).

Strategy: one kernel per (32, BLOCK)-lane tile, entirely in VMEM:
- schoolbook digit product via the MXU: outer product (1024, BLOCK) contracted
  against a constant 0/1 anti-diagonal matrix, split into lo/hi bytes so the
  bf16-rounded MXU inputs stay exact;
- whole-R Montgomery REDC with constant mu/p convolution matrices (two more
  MXU matmuls);
- exact carry propagation via an unrolled Kogge-Stone (no associative_scan —
  Mosaic-friendly manual log-depth shifts).

All three matmuls ride the MXU while carries ride the VPU; a 2^20-lane
mont_mul is ~0.4 TFLOP of MXU work (~2 ms at v5e peak).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field_jax import FieldSpec, _conv_const_matrix, _conv_gather_matrix
from .limbs import DIGIT_BITS, DIGIT_MASK, N_DIGITS

BLOCK = 256  # lanes per kernel instance (VMEM: outer product f32 dominates)


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


def _sub_digits(a, b):
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    borrows = _kogge_stone((d < 0).astype(jnp.uint32), (d == 0).astype(jnp.uint32))
    r = d - borrows.astype(jnp.int32)
    out = jnp.where(r < 0, r + (1 << DIGIT_BITS), r).astype(jnp.uint32)
    last = d.shape[0] - 1  # positive static index (negative lowers to dynamic_slice)
    top = d[last] - borrows[last].astype(jnp.int32)
    return out, (top < 0)


def _f32(x):
    # Mosaic lacks direct uint32<->float32 casts; values fit int32.
    return x.astype(jnp.int32).astype(jnp.float32)


def _u32(x):
    return x.astype(jnp.int32).astype(jnp.uint32)


def _dot(t, x):
    return jax.lax.dot_general(
        t, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mont_mul_body(a, b, tmat, mumat, pmat, pvec):
    nd = N_DIGITS
    prod = (a[:, None, :] * b[None, :, :]).reshape(nd * nd, -1)
    lo = _f32(prod & DIGIT_MASK)
    hi = _f32(prod >> DIGIT_BITS)
    t = _u32(_dot(tmat, lo)) + (_u32(_dot(tmat, hi)) << DIGIT_BITS)
    t_lo = _carry_normalize(t[:nd], nd * DIGIT_MASK * DIGIT_MASK)
    m = _u32(_dot(mumat, _f32(t_lo)))
    m = _carry_normalize(m, nd * DIGIT_MASK * DIGIT_MASK)
    mp = _u32(_dot(pmat, _f32(m)))
    u = jnp.pad(t, [(0, 1), (0, 0)]) + jnp.pad(mp, [(0, 1), (0, 0)])
    u = _carry_normalize(u, 2 * nd * DIGIT_MASK * DIGIT_MASK)
    res = u[nd:]
    diff, under = _sub_digits(res, pvec)
    return jnp.where(under, res, diff)


def _kernel(a_ref, b_ref, tmat_ref, mumat_ref, pmat_ref, pvec_ref, out_ref):
    out_ref[:] = _mont_mul_body(
        a_ref[:], b_ref[:], tmat_ref[:], mumat_ref[:], pmat_ref[:], pvec_ref[:]
    )


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul_pallas(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Batched Montgomery product on (N_DIGITS, N) digit arrays via Pallas.
    N must be a multiple of BLOCK (pad on the caller side)."""
    nd = spec.n_digits
    n = a.shape[1]
    assert a.shape == b.shape == (nd, n)
    assert n % BLOCK == 0, f"pad batch to a multiple of {BLOCK}"
    tmat = jnp.asarray(_conv_gather_matrix(nd, nd, 2 * nd - 1))
    mumat = jnp.asarray(_conv_const_matrix(tuple(int(x) for x in spec.mu_digits), nd, nd))
    pmat = jnp.asarray(_conv_const_matrix(tuple(int(x) for x in spec.p_digits), nd, 2 * nd - 1))
    pvec = jnp.broadcast_to(
        jnp.asarray(spec.p_digits, jnp.uint32).reshape(nd, 1), (nd, BLOCK)
    )
    grid = (n // BLOCK,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nd, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(tmat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mumat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pmat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, BLOCK), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nd, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nd, n), jnp.uint32),
        interpret=interpret,
    )(a, b, tmat, mumat, pmat, pvec)
