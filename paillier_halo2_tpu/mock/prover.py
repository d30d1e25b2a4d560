"""MockProver — vectorized constraint checking over the witness table.

TPU-native equivalent of halo2-axiom's MockProver (SURVEY.md section 2.2):
evaluates every gate, lookup, copy, and constant constraint directly on the
witness without committing. Two interchangeable backends:

- `mock_prove_host`: numpy + Python-int (oracle for the device path)
- `mock_prove_jax`: the witness packed into 8-bit digit vectors, all four
  constraint families evaluated as batched device ops under jit.

Both report the first violated row per constraint family, mirroring
`expect_satisfied(true)` (/root/reference/src/paillier.rs:167-170).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import field_jax as f
from ..ff.host import FR_MOD
from ..gadgets.context import VirtualTable


@dataclasses.dataclass
class MockResult:
    satisfied: bool
    gate_failures: np.ndarray  # row indices of violated gate starts
    lookup_failures: np.ndarray
    copy_failures: np.ndarray  # indices into the copy list
    const_failures: np.ndarray

    def assert_satisfied(self) -> None:
        if not self.satisfied:
            raise AssertionError(
                "MockProver: constraint system not satisfied: "
                f"gates@{self.gate_failures[:5]} lookups@{self.lookup_failures[:5]} "
                f"copies@{self.copy_failures[:5]} consts@{self.const_failures[:5]}"
            )


def mock_prove_host(table: VirtualTable, lookup_bits: int) -> MockResult:
    v = table.values
    gate_bad = []
    for s in table.gates:
        s = int(s)
        if (int(v[s]) + int(v[s + 1]) * int(v[s + 2]) - int(v[s + 3])) % FR_MOD != 0:
            gate_bad.append(s)
    bound = 1 << lookup_bits
    lookup_bad = [int(i) for i in table.lookups if not (0 <= int(v[int(i)]) < bound)]
    copy_bad = [
        j
        for j, (a, b) in enumerate(zip(table.copy_a, table.copy_b))
        if int(v[int(a)]) != int(v[int(b)])
    ]
    const_bad = [
        j
        for j, (i, c) in enumerate(zip(table.const_idx, table.const_val))
        if int(v[int(i)]) != int(c) % FR_MOD
    ]
    ok = not (gate_bad or lookup_bad or copy_bad or const_bad)
    return MockResult(
        ok,
        np.array(gate_bad, dtype=np.int64),
        np.array(lookup_bad, dtype=np.int64),
        np.array(copy_bad, dtype=np.int64),
        np.array(const_bad, dtype=np.int64),
    )


def _check_kernel(spec, w, gates, lookups, copy_a, copy_b, const_idx, const_digits, lookup_bits):
    """All-constraint evaluation on digit vectors; returns violation masks."""
    take = lambda idx: jnp.take(w, idx, axis=1)
    # Gates: w[s] + w[s+1]*w[s+2] == w[s+3] (mod p).
    a, b, c, d = (take(gates + k) for k in range(4))
    prod = f.mont_mul(spec, f.to_mont(spec, b), c)  # plain product b*c mod p
    s = f.add(spec, a, prod)
    gate_bad = jnp.any(f.sub(spec, s, d) != 0, axis=0)
    # Lookups: value < 2^lookup_bits <=> high digits zero + boundary digit bound.
    lv = take(lookups)
    n_full, rem = divmod(lookup_bits, 8)
    high_zero = jnp.all(lv[n_full + (1 if rem else 0) :] == 0, axis=0)
    bound_ok = (lv[n_full] < (1 << rem)) if rem else jnp.ones_like(high_zero, dtype=bool)
    lookup_bad = ~(high_zero & bound_ok)
    # Copies and constants: digit-exact equality.
    copy_bad = jnp.any(take(copy_a) != take(copy_b), axis=0)
    const_bad = jnp.any(take(const_idx) != const_digits, axis=0)
    return gate_bad, lookup_bad, copy_bad, const_bad


def mock_prove_jax(table: VirtualTable, lookup_bits: int) -> MockResult:
    spec = f.FR
    w = jnp.asarray(f.pack_ints([int(x) for x in table.values]))
    const_digits = jnp.asarray(f.pack_ints([int(x) % FR_MOD for x in table.const_val]))

    def nz(x):  # avoid zero-length gathers (pad with row 0 self-compare)
        return jnp.asarray(x if len(x) else np.zeros(1, dtype=np.int64))

    kernel = jax.jit(_check_kernel, static_argnums=(0, 8))
    gate_bad, lookup_bad, copy_bad, const_bad = kernel(
        spec,
        w,
        nz(table.gates),
        nz(table.lookups),
        nz(table.copy_a),
        nz(table.copy_b),
        nz(table.const_idx) if len(table.const_idx) else jnp.zeros(1, dtype=jnp.int64),
        const_digits if len(table.const_val) else jnp.zeros((32, 1), jnp.uint32),
        lookup_bits,
    )

    def fails(mask, src, n_real):
        mask = np.asarray(mask)[:n_real]
        return np.asarray(src[:n_real])[mask] if n_real else np.zeros(0, dtype=np.int64)

    gf = fails(gate_bad, table.gates, len(table.gates))
    lf = fails(lookup_bad, table.lookups, len(table.lookups))
    cf = (
        np.nonzero(np.asarray(copy_bad)[: len(table.copy_a)])[0]
        if len(table.copy_a)
        else np.zeros(0, dtype=np.int64)
    )
    kf = (
        np.nonzero(np.asarray(const_bad)[: len(table.const_idx)])[0]
        if len(table.const_idx)
        else np.zeros(0, dtype=np.int64)
    )
    ok = not (len(gf) or len(lf) or len(cf) or len(kf))
    return MockResult(ok, gf, lf, cf, kf)
