"""Compile-lean lowering switch.

XLA:CPU's LLVM backend spends ~1.5 s compiling EVERY mont_mul instance (the
digit-convolution dots dominate LLVM time), so graphs that unroll field ops —
NTT stages, associative scans, point-addition formulas (~23 muls each) — cost
minutes of compile on the CPU paths (tests, virtual meshes, the driver's
multi-chip dryrun). Round 2's driver gates both timed out on exactly this.

compile_lean() selects alternative lowerings that run the same math through
fori_loop bodies with ONE compiled instance of each field op: scanned NTT
stages, Hillis-Steele prefix scans, and a straight-line-program interpreter
for point adds. They trade some runtime work (gathers, n*log n scan work) for
orders-of-magnitude less compile — the right trade on compile-bound CPU, the
wrong one on accelerators where the unrolled forms stay default.
"""
from __future__ import annotations

import os


def compile_lean() -> bool:
    env = os.environ.get("PAILLIER_TPU_COMPILE_LEAN")
    if env is not None:
        return env == "1"
    import jax

    return jax.default_backend() == "cpu"
