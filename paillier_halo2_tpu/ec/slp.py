"""Straight-line-program execution of point-addition formulas — the
compile-lean lowering for the XLA (non-Pallas) point paths.

A Jacobian add unrolls ~23 Montgomery multiplies; XLA:CPU's LLVM backend
spends ~1.5 s compiling EACH one, so every padd instance in a graph costs
~35 s of compile (measured; the round-2 driver dryrun timed out on the
sharded-MSM graph's handful of instances). Here the formula runs as a tiny
interpreter instead: registers are one stacked (R, D, B) array, the formula
is a host-constant (T, 4) table of (op, src1, src2, dst) steps, and a single
fori_loop body — one mont_mul + one add + one sub + a select — executes all
T steps. Compile cost per padd instance drops to ~2 s regardless of formula
length; runtime gains the gather/update overhead, which is the right trade
on the compile-bound CPU path (accelerators use the fused Pallas kernels and
never come here).

Formulas mirror ec/bn254.py padd / padd_mixed exactly (add-2007-bl,
madd-2007-bl, dbl-2009-l); the edge-case mask logic stays in bn254.py — this
module only evaluates the generic and doubling branches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import field_jax as f

MUL, ADD, SUB = 0, 1, 2


class _Prog:
    """SSA program builder: registers 0..n_inputs-1 are the inputs, every
    emitted op appends one register."""

    def __init__(self, n_inputs: int):
        self.n_inputs = n_inputs
        self.n_regs = n_inputs
        self.steps: list[tuple[int, int, int, int]] = []

    def _emit(self, op: int, a: int, b: int) -> int:
        dst = self.n_regs
        self.steps.append((op, a, b, dst))
        self.n_regs += 1
        return dst

    def mul(self, a: int, b: int) -> int:
        return self._emit(MUL, a, b)

    def sqr(self, a: int) -> int:
        return self._emit(MUL, a, a)

    def add(self, a: int, b: int) -> int:
        return self._emit(ADD, a, b)

    def sub(self, a: int, b: int) -> int:
        return self._emit(SUB, a, b)

    def table(self) -> np.ndarray:
        return np.asarray(self.steps, dtype=np.int32)


def _emit_double(pr: _Prog, X1: int, Y1: int, Z1: int) -> tuple[int, int, int]:
    """dbl-2009-l (a = 0) — mirrors bn254.pdouble."""
    A = pr.sqr(X1)
    B = pr.sqr(Y1)
    C = pr.sqr(B)
    xb = pr.add(X1, B)
    t = pr.sqr(xb)
    D = pr.sub(pr.sub(t, A), C)
    D = pr.add(D, D)
    E = pr.add(pr.add(A, A), A)
    F = pr.sqr(E)
    Xd = pr.sub(F, pr.add(D, D))
    C8 = pr.add(C, C)
    C8 = pr.add(C8, C8)
    C8 = pr.add(C8, C8)
    Yd = pr.sub(pr.mul(E, pr.sub(D, Xd)), C8)
    YZ = pr.mul(Y1, Z1)
    Zd = pr.add(YZ, YZ)
    return Xd, Yd, Zd


@functools.lru_cache(maxsize=None)
def _jacobian_program() -> dict:
    """Full Jacobian + Jacobian: inputs (X1, Y1, Z1, X2, Y2, Z2)."""
    pr = _Prog(6)
    X1, Y1, Z1, X2, Y2, Z2 = range(6)
    z1z1 = pr.sqr(Z1)
    z2z2 = pr.sqr(Z2)
    u1 = pr.mul(X1, z2z2)
    u2 = pr.mul(X2, z1z1)
    s1 = pr.mul(Y1, pr.mul(Z2, z2z2))
    s2 = pr.mul(Y2, pr.mul(Z1, z1z1))
    h = pr.sub(u2, u1)
    r = pr.sub(s2, s1)
    hh = pr.sqr(h)
    hhh = pr.mul(h, hh)
    v = pr.mul(u1, hh)
    rr = pr.sqr(r)
    X3 = pr.sub(pr.sub(rr, hhh), pr.add(v, v))
    Y3 = pr.sub(pr.mul(r, pr.sub(v, X3)), pr.mul(s1, hhh))
    Z3 = pr.mul(pr.mul(Z1, Z2), h)
    Xd, Yd, Zd = _emit_double(pr, X1, Y1, Z1)
    return dict(
        table=pr.table(), n_regs=pr.n_regs, n_inputs=6,
        out=dict(h=h, r=r, X3=X3, Y3=Y3, Z3=Z3, Xd=Xd, Yd=Yd, Zd=Zd),
    )


@functools.lru_cache(maxsize=None)
def _mixed_program() -> dict:
    """Jacobian + affine: inputs (X1, Y1, Z1, X2, Y2)."""
    pr = _Prog(5)
    X1, Y1, Z1, X2, Y2 = range(5)
    z1z1 = pr.sqr(Z1)
    u2 = pr.mul(X2, z1z1)
    s2 = pr.mul(Y2, pr.mul(Z1, z1z1))
    h = pr.sub(u2, X1)
    r = pr.sub(s2, Y1)
    hh = pr.sqr(h)
    hhh = pr.mul(h, hh)
    v = pr.mul(X1, hh)
    rr = pr.sqr(r)
    X3 = pr.sub(pr.sub(rr, hhh), pr.add(v, v))
    Y3 = pr.sub(pr.mul(r, pr.sub(v, X3)), pr.mul(Y1, hhh))
    Z3 = pr.mul(Z1, h)
    Xd, Yd, Zd = _emit_double(pr, X1, Y1, Z1)
    return dict(
        table=pr.table(), n_regs=pr.n_regs, n_inputs=5,
        out=dict(h=h, r=r, X3=X3, Y3=Y3, Z3=Z3, Xd=Xd, Yd=Yd, Zd=Zd),
    )


def _run(spec: f.FieldSpec, prog: dict, inputs: list[jnp.ndarray]) -> jnp.ndarray:
    """Execute; returns the full (n_regs, D, *batch) register file."""
    assert len(inputs) == prog["n_inputs"]
    batch = jnp.broadcast_shapes(*(x.shape[1:] for x in inputs))
    regs = jnp.zeros((prog["n_regs"], spec.n_digits) + batch, jnp.uint32)
    for i, x in enumerate(inputs):
        regs = regs.at[i].set(jnp.broadcast_to(x, (spec.n_digits,) + batch))
    steps = jnp.asarray(prog["table"])

    def body(i, regs):
        op, ia, ib, dst = (steps[i, c] for c in range(4))
        a = jax.lax.dynamic_index_in_dim(regs, ia, 0, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(regs, ib, 0, keepdims=False)
        m = f.mont_mul(spec, a, b)
        s = f.add(spec, a, b)
        d = f.sub(spec, a, b)
        val = jnp.where(op == MUL, m, jnp.where(op == ADD, s, d))
        return jax.lax.dynamic_update_index_in_dim(regs, val, dst, 0)

    return jax.lax.fori_loop(0, len(prog["table"]), body, regs)


def jacobian_branches(spec, X1, Y1, Z1, X2, Y2, Z2):
    """Generic-add and doubling branch results plus (h, r) for the caller's
    edge-case masks; identical values to the unrolled formulas."""
    prog = _jacobian_program()
    regs = _run(spec, prog, [X1, Y1, Z1, X2, Y2, Z2])
    o = prog["out"]
    return {k: regs[v] for k, v in o.items()}


def mixed_branches(spec, X1, Y1, Z1, X2, Y2):
    prog = _mixed_program()
    regs = _run(spec, prog, [X1, Y1, Z1, X2, Y2])
    o = prog["out"]
    return {k: regs[v] for k, v in o.items()}
