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


# Above this many virtual rows the one-shot kernel's witness tensor
# (32 x N uint32) stops fitting in HBM; stream in chunks instead.
_CHUNK_THRESHOLD_ROWS = 1 << 23


def _pack_u8(vals, out=None) -> np.ndarray:
    """Object ints -> (N, 32) uint8 little-endian digit rows (host)."""
    n = len(vals)
    if out is None:
        out = np.empty((n, 32), np.uint8)
    step = 1 << 20
    for s in range(0, n, step):
        sub = vals[s : s + step]
        buf = b"".join(int(v).to_bytes(32, "little") for v in sub)
        out[s : s + len(sub)] = np.frombuffer(buf, np.uint8).reshape(-1, 32)
    return out


def _gate_lookup_chunk_kernel(spec, w8, gates, lookups, lookup_bits):
    """One witness chunk: gates (4 consecutive rows each) + range lookups.
    w8: (rows, 32) uint8; indices are chunk-local (padding points at row 0,
    whose self-consistent values are filtered host-side)."""
    w = w8.T.astype(jnp.uint32)  # (32, rows)
    take = lambda idx: jnp.take(w, idx, axis=1)
    a, b, c, d = (take(gates + k) for k in range(4))
    prod = f.mont_mul(spec, f.to_mont(spec, b), c)
    s = f.add(spec, a, prod)
    gate_bad = jnp.any(f.sub(spec, s, d) != 0, axis=0)
    lv = take(lookups)
    n_full, rem = divmod(lookup_bits, 8)
    high_zero = jnp.all(lv[n_full + (1 if rem else 0) :] == 0, axis=0)
    bound_ok = (lv[n_full] < (1 << rem)) if rem else jnp.ones_like(high_zero, dtype=bool)
    lookup_bad = ~(high_zero & bound_ok)
    return gate_bad, lookup_bad


def mock_prove_chunked(
    table: VirtualTable, lookup_bits: int, chunk_rows: int = 1 << 22
) -> MockResult:
    """Streaming MockProver for tables too large to hold on device at once
    (the 2048-bit geometry of BASELINE.json config 1 is ~280M virtual rows =
    36 GB packed). The witness lives host-side as a (N, 32) uint8 digit
    matrix; gates/lookups stream through the device in fixed-shape chunks
    (gate windows are 4 consecutive rows, so a 3-row chunk overlap keeps
    every window local); copy and constant equalities — arbitrary-distance
    row compares — run as vectorized host numpy over the same matrix."""
    spec = f.FR
    n = table.n_rows
    wb = _pack_u8(table.values)

    # ---- copies + constants (host, sliced gathers) -------------------------
    def _host_pairs_bad(ai, bi):
        bad = []
        step = 1 << 24
        for s in range(0, len(ai), step):
            neq = (wb[ai[s : s + step]] != wb[bi[s : s + step]]).any(axis=1)
            bad.extend((np.nonzero(neq)[0] + s).tolist())
        return np.array(bad, dtype=np.int64)

    copy_bad = _host_pairs_bad(np.asarray(table.copy_a), np.asarray(table.copy_b))
    const_bad = np.zeros(0, dtype=np.int64)
    if len(table.const_idx):
        cv = _pack_u8([int(x) % FR_MOD for x in table.const_val])
        neq = (wb[np.asarray(table.const_idx)] != cv).any(axis=1)
        const_bad = np.nonzero(neq)[0].astype(np.int64)

    # ---- gates + lookups (device, fixed-shape chunks) ----------------------
    gates = np.asarray(table.gates, dtype=np.int64)
    lookups = np.asarray(table.lookups, dtype=np.int64)
    kernel = jax.jit(_gate_lookup_chunk_kernel, static_argnums=(0, 4))
    gate_fail, lookup_fail = [], []
    # Exact per-chunk caps from the real index densities (one compile for all
    # chunks; padding gathers row 0 and is filtered after).
    starts = list(range(0, n, chunk_rows))
    g_chunk = np.minimum(gates // chunk_rows, len(starts) - 1) if len(gates) else gates
    l_chunk = np.minimum(lookups // chunk_rows, len(starts) - 1) if len(lookups) else lookups
    g_cap = int(np.bincount(g_chunk, minlength=len(starts)).max()) if len(gates) else 1
    l_cap = int(np.bincount(l_chunk, minlength=len(starts)).max()) if len(lookups) else 1
    for start in starts:
        end = min(start + chunk_rows + 3, n)
        rows = end - start
        w8 = np.zeros((chunk_rows + 3, 32), np.uint8)
        w8[:rows] = wb[start:end]
        g_sel = gates[(gates >= start) & (gates + 3 < start + chunk_rows + 3)]
        # gates starting in the overlap belong to the NEXT chunk
        g_sel = g_sel[g_sel < start + chunk_rows]
        l_sel = lookups[(lookups >= start) & (lookups < start + chunk_rows)]
        lo = lookups[(lookups >= start + chunk_rows) & (lookups < end)]
        assert len(g_sel) <= g_cap and len(l_sel) + 0 <= l_cap
        g_loc = np.zeros(g_cap, dtype=np.int32)
        g_loc[: len(g_sel)] = (g_sel - start).astype(np.int32)
        l_loc = np.zeros(l_cap, dtype=np.int32)
        l_loc[: len(l_sel)] = (l_sel - start).astype(np.int32)
        gb, lb = kernel(spec, jnp.asarray(w8), jnp.asarray(g_loc), jnp.asarray(l_loc), lookup_bits)
        gb = np.asarray(gb)[: len(g_sel)]
        lb = np.asarray(lb)[: len(l_sel)]
        gate_fail.extend(g_sel[gb].tolist())
        lookup_fail.extend(l_sel[lb].tolist())
        del lo  # overlap lookups re-selected by the next chunk's range

    gf = np.array(gate_fail, dtype=np.int64)
    lf = np.array(lookup_fail, dtype=np.int64)
    ok = not (len(gf) or len(lf) or len(copy_bad) or len(const_bad))
    return MockResult(ok, gf, lf, copy_bad, const_bad)


def mock_prove_jax(table: VirtualTable, lookup_bits: int) -> MockResult:
    spec = f.FR
    if table.n_rows > _CHUNK_THRESHOLD_ROWS:
        return mock_prove_chunked(table, lookup_bits)
    w = jnp.asarray(_pack_u8(table.values).T.astype(np.uint32))
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
