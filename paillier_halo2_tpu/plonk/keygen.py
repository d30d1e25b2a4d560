"""Key generation — replacement for halo2-axiom's keygen_vk/keygen_pk
(SURVEY.md section 2.2, "PLONKish core"; bench use-site
/root/reference/src/bench.rs:165-178).

The proving key precomputes, once per circuit shape: the column layout, every
fixed polynomial (selectors, constant column, range table, permutation sigmas,
active-row indicator, boundary Lagrange polys) in value + Montgomery
coefficient form on device, and their commitments (the verifying key).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..ec import host as ech
from ..ff import host
from ..gadgets.context import VirtualTable
from .params import BLINDING_ROWS
from ..poly import ops
from .kzg import commit_many
from .layout import CircuitLayout, assign_layout
from .srs import SRS

P = host.FR_MOD

# delta: generator of the 2^28-torsion-free part of Fr* — coset representatives
# delta^j H are pairwise disjoint for the permutation identity columns.
DELTA = pow(host.FR_GENERATOR, 1 << host.FR_TWO_ADICITY, P)

EXTENDED_RATE_BITS = 2  # max constraint degree 4 -> extended domain 4n
PERM_CHUNK = 2  # permutation columns per grand-product (degree 2+PERM_CHUNK)

# Per-call phase timings of the last keygen() (seconds). The bench harness
# uses "commit" (fixed-commitment MSMs = the verifying-key share) to split
# keygen into the reference's vk_time/pk_time semantics (bench.rs:174-175).
KEYGEN_PHASE_TIMES: dict[str, float] = {}


@dataclasses.dataclass
class VerifyingKey:
    k: int
    lookup_bits: int
    num_advice: int
    num_lookup_advice: int
    n_perm_cols: int
    perm_chunks: list[list[int]]
    usable: int
    advice_blind: None = None  # placeholder for future zk audit metadata
    # Multi-open scheme: "shplonk" (BDFG20 — 2 W points, the halo2-axiom
    # harness default [dep]) or "gwc" (one W point per opening point).
    # Recorded in the key so prover and verifier always agree.
    multiopen: str = "shplonk"
    # Public-input (instance) column count (0 or 1) — when 1, verify_proof
    # requires the statement's instance values and re-derives their
    # evaluation itself (halo2 instance columns [dep]).
    num_instance: int = 0
    # fixed commitments
    q_commits: list[ech.Point] = dataclasses.field(default_factory=list)
    fixed_const_commit: ech.Point = None
    table_commit: ech.Point = None
    sigma_commits: list[ech.Point] = dataclasses.field(default_factory=list)

    @property
    def n(self) -> int:
        return 1 << self.k

    def fixed_commitments(self) -> list[ech.Point]:
        return [*self.q_commits, self.fixed_const_commit, self.table_commit, *self.sigma_commits]


@dataclasses.dataclass
class ProvingKey:
    vk: VerifyingKey
    layout: CircuitLayout
    srs: SRS
    # device Montgomery coefficient forms
    q_coeffs: list[jnp.ndarray]
    fixed_const_coeffs: jnp.ndarray
    table_coeffs: jnp.ndarray
    sigma_coeffs: list[jnp.ndarray]
    active_coeffs: jnp.ndarray
    l0_coeffs: jnp.ndarray
    lu_coeffs: jnp.ndarray
    id_values: np.ndarray  # (n_perm_cols, n) object ints delta^j * omega^r
    sigma_values: np.ndarray  # (n_perm_cols, n) object ints
    table_values: np.ndarray  # (n,) object ints
    fixed_const_values: np.ndarray

    @property
    def k(self) -> int:
        return self.vk.k


def _commit_fixed(srs: SRS, coeffs_list: list) -> list:
    """Fixed-polynomial commitments. Selector polynomials are 0/1-valued,
    which skews the device MSM's sorted-bucket loop (half the points land in
    ONE bucket of window 0, inflating the gather-round count) — but keygen
    runs once per circuit shape and the device path still beats the
    single-threaded host C++ alternative on this hardware (measured: 605 s
    native vs ~150 s device at k=14, dominated by per-poly readbacks over
    the tunnel). PAILLIER_TPU_KEYGEN_COMMIT=native opts into the C++ path
    for CPU-rich hosts."""
    import os as _os

    m = coeffs_list[0].shape[1]
    if (
        ops._ACTIVE_MESH is None
        and _os.environ.get("PAILLIER_TPU_KEYGEN_COMMIT") == "native"
    ):
        from ..native import lib as _native_lib

        if _native_lib() is not None:
            from .kzg import _commit_many_native

            return _commit_many_native(srs, coeffs_list, m)
    return commit_many(srs, coeffs_list)


def _values_to_coeffs(vals) -> jnp.ndarray:
    import math

    arr = ops.to_device_mont(vals)
    k = int(math.log2(arr.shape[1]))
    return ops.coeffs_of(arr, k)


def keygen(table: VirtualTable, k: int, lookup_bits: int, srs: SRS) -> ProvingKey:
    from ..utils.trace import PhaseTimer

    _mark = PhaseTimer("keygen").mark

    assert srs.k >= k
    layout = assign_layout(table, k, lookup_bits)
    _mark("layout assigned")
    n = 1 << k
    usable = n - BLINDING_ROWS
    na = layout.num_advice
    nl = layout.num_lookup_advice
    n_perm_cols = layout.n_perm_cols

    # -- fixed value columns -------------------------------------------------
    q_vals = [layout.q[c].astype(object) for c in range(na)]
    fixed_const_vals = layout.fixed_const
    assert (1 << lookup_bits) <= usable, "range table does not fit active region"
    table_vals = np.zeros(n, dtype=object)
    for i in range(1 << lookup_bits):
        table_vals[i] = i

    omega_pows = [1] * n
    w = host.root_of_unity(k)
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * w % P
    delta_pows = [1] * n_perm_cols
    for j in range(1, n_perm_cols):
        delta_pows[j] = delta_pows[j - 1] * DELTA % P

    id_values = np.empty((n_perm_cols, n), dtype=object)
    sigma_values = np.empty((n_perm_cols, n), dtype=object)
    for j in range(n_perm_cols):
        dj = delta_pows[j]
        for r in range(n):
            id_values[j, r] = dj * omega_pows[r] % P
    sc, sr = layout.sigma_col, layout.sigma_row
    for j in range(n_perm_cols):
        for r in range(n):
            sigma_values[j, r] = delta_pows[sc[j, r]] * omega_pows[sr[j, r]] % P

    active_vals = np.zeros(n, dtype=object)
    active_vals[:usable] = 1
    l0_vals = np.zeros(n, dtype=object)
    l0_vals[0] = 1
    lu_vals = np.zeros(n, dtype=object)
    lu_vals[usable] = 1

    # -- coefficient forms + commitments (ONE batched iNTT for all fixed
    # polynomials: selectors, const, table, sigmas, active, l0, lu) ---------
    _mark("fixed values built")
    fixed_stack = np.stack(
        q_vals
        + [fixed_const_vals, table_vals]
        + [sigma_values[j] for j in range(n_perm_cols)]
        + [active_vals, l0_vals, lu_vals]
    )
    # Slab the batched iNTT: at k=17 with ~170 fixed columns the whole-stack
    # transform's ~20x transient needs 18 GB (the 512-bit keygen OOM'd the
    # 15.75 GB chip at COMPILE time). Values identical; one NTT per slab.
    from .prover import _device_hbm_bytes

    col_bytes = 32 * 4 * n
    ch = max(1, int(0.7 * _device_hbm_bytes() / (20 * col_bytes)))
    stack_dev = ops.to_device_mont(fixed_stack)
    m_total = stack_dev.shape[1]
    if m_total <= ch:
        all_coeffs = ops.coeffs_of(stack_dev, k)
    else:
        import jax

        parts = []
        for c0 in range(0, m_total, ch):
            parts.append(ops.coeffs_of(stack_dev[:, c0 : c0 + ch], k))
            jax.block_until_ready(parts[-1])  # HBM backpressure
        all_coeffs = jnp.concatenate(parts, axis=1)
        del parts
    del stack_dev
    _mark("fixed coeffs (batched iNTT)")
    q_coeffs = [all_coeffs[:, i] for i in range(na)]
    fixed_const_coeffs = all_coeffs[:, na]
    table_coeffs = all_coeffs[:, na + 1]
    sigma_coeffs = [all_coeffs[:, na + 2 + j] for j in range(n_perm_cols)]
    active_coeffs = all_coeffs[:, na + 2 + n_perm_cols]
    l0_coeffs = all_coeffs[:, na + 3 + n_perm_cols]
    lu_coeffs = all_coeffs[:, na + 4 + n_perm_cols]

    perm_chunks = [
        list(range(s, min(s + PERM_CHUNK, n_perm_cols)))
        for s in range(0, n_perm_cols, PERM_CHUNK)
    ]

    import time as _time

    _t_commit = _time.monotonic()
    fixed_list = q_coeffs + [fixed_const_coeffs, table_coeffs] + sigma_coeffs
    all_commits = _commit_fixed(srs, fixed_list)
    KEYGEN_PHASE_TIMES["commit"] = _time.monotonic() - _t_commit
    _mark("fixed commitments (batched MSM)")
    import os

    vk = VerifyingKey(
        k=k,
        lookup_bits=lookup_bits,
        num_advice=na,
        num_lookup_advice=nl,
        n_perm_cols=n_perm_cols,
        perm_chunks=perm_chunks,
        usable=usable,
        multiopen=os.environ.get("PAILLIER_TPU_MULTIOPEN", "shplonk"),
        num_instance=layout.num_instance,
        q_commits=all_commits[:na],
        fixed_const_commit=all_commits[na],
        table_commit=all_commits[na + 1],
        sigma_commits=all_commits[na + 2 :],
    )
    return ProvingKey(
        vk=vk,
        layout=layout,
        srs=srs,
        q_coeffs=q_coeffs,
        fixed_const_coeffs=fixed_const_coeffs,
        table_coeffs=table_coeffs,
        sigma_coeffs=sigma_coeffs,
        active_coeffs=active_coeffs,
        l0_coeffs=l0_coeffs,
        lu_coeffs=lu_coeffs,
        id_values=id_values,
        sigma_values=sigma_values,
        table_values=table_vals,
        fixed_const_values=fixed_const_vals,
    )
