"""Bench harness — the `bench_builder` path of base_test
(/root/reference/src/bench.rs:161-178 use-site; halo2-base BenchStats [dep]).

Runs the full pipeline: shape discovery (config auto-sizing), SRS load/create,
keygen, witness generation + proof creation, verification — reporting the
same stat fields the reference prints: config_params, vk_time, pk_time,
proof_time, proof_size, verify_time.
"""
from __future__ import annotations

import dataclasses
import time

from ..gadgets.context import Context
from ..gadgets.range import RangeChip
from ..plonk.keygen import keygen
from ..plonk.prover import create_proof
from ..plonk.srs import read_or_create_srs
from ..plonk.verifier import verify_proof
from .base_test import ConfigParams


@dataclasses.dataclass
class BenchStats:
    config_params: ConfigParams
    srs_time: float
    vk_time: float
    pk_time: float
    proof_time: float
    proof_size: int
    verify_time: float
    verified: bool

    def pretty(self) -> str:
        return (
            f"config params = {self.config_params}\n"
            f"srs time = {self.srs_time:.3f}s\n"
            f"vk time = {self.vk_time:.3f}s\n"
            f"pk time = {self.pk_time:.3f}s\n"
            f"proof time = {self.proof_time:.3f}s\n"
            f"proof size = {self.proof_size}\n"
            f"verify time = {self.verify_time:.3f}s (verified={self.verified})"
        )


def bench_builder(k: int, lookup_bits: int, init_input, logic_input, circuit_fn) -> BenchStats:
    """circuit_fn(ctx, range_chip, input) builds the circuit, mirroring the
    closure passed at /root/reference/src/bench.rs:165-171."""
    # Phase A: shape discovery with the init input.
    ctx = Context()
    rc = RangeChip(ctx, lookup_bits)
    circuit_fn(ctx, rc, init_input)
    shape_table = ctx.finalize()

    t0 = time.monotonic()
    srs = read_or_create_srs(k)
    t1 = time.monotonic()
    pk = keygen(shape_table, k, lookup_bits, srs)
    t2 = time.monotonic()

    # Phase B: witness generation with the logic input (fresh synthesis).
    ctx2 = Context()
    rc2 = RangeChip(ctx2, lookup_bits)
    circuit_fn(ctx2, rc2, logic_input)
    table = ctx2.finalize()
    assert table.n_rows == shape_table.n_rows, "circuit shape depends on witness"
    t3 = time.monotonic()
    proof = create_proof(pk, table)
    t4 = time.monotonic()
    ok = verify_proof(pk.vk, srs, proof)
    t5 = time.monotonic()

    return BenchStats(
        config_params=pk.layout.config,
        srs_time=t1 - t0,
        vk_time=t2 - t1,
        pk_time=t3 - t2,
        proof_time=t4 - t3,
        proof_size=len(proof),
        verify_time=t5 - t4,
        verified=ok,
    )
