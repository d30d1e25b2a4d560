"""Test/bench harness — re-design of halo2-base's `base_test()` builder
(SURVEY.md section 2.2; use-sites /root/reference/src/paillier.rs:167-181,
/root/reference/src/bench.rs:161-178). Builder API:

    base_test().k(16).lookup_bits(15).expect_satisfied(True).run(closure)

The closure receives (ctx, range_chip) like the reference's (ctx, range).
`run` finalizes the virtual table, auto-sizes the column config (the
config_params dry-run analog), and checks all constraints with the MockProver.
"""
from __future__ import annotations

import dataclasses
import time

from ..gadgets.context import Context, VirtualTable
from ..gadgets.range import RangeChip
from ..mock.prover import MockResult, mock_prove_host, mock_prove_jax
from ..plonk.params import BLINDING_ROWS, ConfigParams  # re-export (moved to leaf module)

__all__ = ["BLINDING_ROWS", "BaseTester", "ConfigParams", "RunResult", "base_test"]


@dataclasses.dataclass
class RunResult:
    table: VirtualTable
    config: ConfigParams
    mock: MockResult
    synth_time_s: float
    mock_time_s: float


class BaseTester:
    def __init__(self) -> None:
        self._k = 16
        self._lookup_bits = 15
        self._expect_satisfied = True
        self._backend = "jax"

    def k(self, k: int) -> "BaseTester":
        self._k = k
        return self

    def lookup_bits(self, bits: int) -> "BaseTester":
        self._lookup_bits = bits
        return self

    def expect_satisfied(self, flag: bool) -> "BaseTester":
        self._expect_satisfied = flag
        return self

    def backend(self, name: str) -> "BaseTester":
        assert name in ("jax", "host")
        self._backend = name
        return self

    def run(self, closure) -> RunResult:
        ctx = Context()
        range_chip = RangeChip(ctx, self._lookup_bits)
        t0 = time.monotonic()
        closure(ctx, range_chip)
        table = ctx.finalize()
        t1 = time.monotonic()
        config = ConfigParams.size_for(table, self._k, self._lookup_bits)
        prove = mock_prove_jax if self._backend == "jax" else mock_prove_host
        mock = prove(table, self._lookup_bits)
        t2 = time.monotonic()
        if self._expect_satisfied:
            mock.assert_satisfied()
        else:
            assert not mock.satisfied, "expected an unsatisfied constraint system"
        return RunResult(table, config, mock, t1 - t0, t2 - t1)

    def bench_builder(self, init_input, logic_input, circuit_fn):
        """Full prove/verify pipeline — the reference's
        `.bench_builder(init_input, input, f)` (/root/reference/src/bench.rs:
        161-171): shape discovery with `init_input`, keygen, witness synthesis
        with `logic_input`, KZG proof, verification. Returns BenchStats."""
        from .bench import bench_builder as _bench

        return _bench(self._k, self._lookup_bits, init_input, logic_input, circuit_fn)


def base_test() -> BaseTester:
    return BaseTester()
