"""Column assignment: virtual table -> PLONKish circuit layout.

Re-design of halo2-base's RangeCircuitBuilder assignment step (SURVEY.md
section 2.2, "Context / SinglePhaseCoreManager / RangeCircuitBuilder"): the
single virtual column is split column-major into `num_advice` columns of
height 2^k, with two layout invariants the prover depends on:

1. a 4-row gate block never straddles a column boundary (gates constrain
   rotations within one column), enforced by padding to the next column when
   a block would split;
2. the bottom BLINDING_ROWS of every column are reserved for blinding.

Lookup-tagged cells are replicated (via copy constraint) into dedicated
lookup-advice columns, halo2-base style, so the lookup argument runs over
whole columns against the fixed range table.

Outputs a `CircuitLayout` with: per-column witness digit arrays, the selector
column, the fixed constant column, permutation cycles over (column, row)
cells, and lookup column assignments.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..gadgets.context import VirtualTable
from ..harness.base_test import BLINDING_ROWS, ConfigParams


@dataclasses.dataclass
class CircuitLayout:
    config: ConfigParams
    n: int  # 2^k
    # virtual row -> (column, row) mapping
    col_of: np.ndarray  # (n_virtual,)
    row_of: np.ndarray  # (n_virtual,)
    # selector: per advice column, rows where a gate starts
    q: np.ndarray  # (num_advice, n) uint8
    # fixed constant column: value per row (object ints), and for each constant
    # cell the (col,row) it is copy-linked to is folded into the permutation
    fixed_const: np.ndarray  # (n,) object
    # permutation cycles: for every cell in a copy-equivalence class, its
    # successor cell (sigma), over columns = [advice..., lookup_advice..., fixed]
    sigma_col: np.ndarray  # (n_perm_cols, n)
    sigma_row: np.ndarray  # (n_perm_cols, n)
    # lookup advice columns: source virtual rows feeding each (col, row) slot
    lookup_src: np.ndarray  # (num_lookup_advice, n) int64, -1 = unused (0 value)
    n_virtual: int

    @property
    def num_advice(self) -> int:
        return self.config.num_advice

    @property
    def num_lookup_advice(self) -> int:
        return self.config.num_lookup_advice

    @property
    def n_perm_cols(self) -> int:
        return self.num_advice + self.num_lookup_advice + 1  # + fixed column


def assign_layout(table: VirtualTable, k: int, lookup_bits: int) -> CircuitLayout:
    n = 1 << k
    usable = n - BLINDING_ROWS
    n_virtual = table.n_rows

    # ---- place virtual rows into columns, never splitting a gate block ----
    gate_starts = np.sort(table.gates)
    is_gate_start = np.zeros(n_virtual + 1, dtype=bool)
    is_gate_start[gate_starts] = True

    col_of = np.zeros(n_virtual, dtype=np.int64)
    row_of = np.zeros(n_virtual, dtype=np.int64)
    col, row, v = 0, 0, 0
    # Walk blocks: a block is 4 rows if a gate starts at v else 1 row.
    while v < n_virtual:
        blk = 4 if is_gate_start[v] else 1
        if row + blk > usable:
            col += 1
            row = 0
        assert blk <= usable, "column too short for a gate block"
        col_of[v : v + blk] = col
        row_of[v : v + blk] = row + np.arange(blk)
        row += blk
        v += blk
    num_advice = col + 1

    # ---- selector columns --------------------------------------------------
    q = np.zeros((num_advice, n), dtype=np.uint8)
    q[col_of[gate_starts], row_of[gate_starts]] = 1

    # ---- lookup advice columns --------------------------------------------
    n_lookups = len(table.lookups)
    num_lookup_advice = max(0, -(-n_lookups // usable))
    lookup_src = np.full((max(num_lookup_advice, 0), n), -1, dtype=np.int64)
    for j, vrow in enumerate(table.lookups):
        lc, lr = divmod(j, usable)
        lookup_src[lc, lr] = vrow

    # ---- fixed constant column --------------------------------------------
    fixed_const = np.zeros(n, dtype=object)
    const_cells = {}
    next_fixed = 0
    const_pos = np.zeros(len(table.const_idx), dtype=np.int64)
    for j, (vrow, val) in enumerate(zip(table.const_idx, table.const_val)):
        key = int(val)
        if key not in const_cells:
            assert next_fixed < usable, "fixed column overflow"
            const_cells[key] = next_fixed
            fixed_const[next_fixed] = key
            next_fixed += 1
        const_pos[j] = const_cells[key]

    # ---- permutation cycles ------------------------------------------------
    # Columns in the permutation: advice 0..na-1, lookup advice na..na+nl-1,
    # fixed at index na+nl. Build union-find over cell ids.
    n_perm_cols = num_advice + num_lookup_advice + 1
    total = n_perm_cols * n

    def cell_id(c, r):
        return c * n + r

    parent = np.arange(total, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    def vcell(vrow):
        return cell_id(col_of[vrow], row_of[vrow])

    for a, b in zip(table.copy_a, table.copy_b):
        union(vcell(a), vcell(b))
    fixed_col = num_advice + num_lookup_advice
    for j, vrow in enumerate(table.const_idx):
        union(vcell(vrow), cell_id(fixed_col, const_pos[j]))
    for lc in range(num_lookup_advice):
        for lr in range(n):
            src = lookup_src[lc, lr]
            if src >= 0:
                union(vcell(src), cell_id(num_advice + lc, lr))

    # sigma: next cell in each cycle (cycle order = discovery order per root)
    groups: dict[int, list[int]] = {}
    # Only cells that participate in some copy need nontrivial sigma; but we
    # must emit sigma for every cell. Walk participants only.
    participants = set()
    for arr in (table.copy_a, table.copy_b):
        for v_ in arr:
            participants.add(vcell(v_))
    for j, vrow in enumerate(table.const_idx):
        participants.add(vcell(vrow))
        participants.add(cell_id(fixed_col, const_pos[j]))
    for lc in range(num_lookup_advice):
        for lr in range(n):
            if lookup_src[lc, lr] >= 0:
                participants.add(cell_id(num_advice + lc, lr))
    for cid in sorted(participants):
        groups.setdefault(find(cid), []).append(cid)

    sigma = np.arange(total, dtype=np.int64)
    for members in groups.values():
        for i, cid in enumerate(members):
            sigma[cid] = members[(i + 1) % len(members)]
    sigma_col = (sigma // n).reshape(n_perm_cols, n)
    sigma_row = (sigma % n).reshape(n_perm_cols, n)

    config = ConfigParams(k, lookup_bits, num_advice, num_lookup_advice)
    return CircuitLayout(
        config=config,
        n=n,
        col_of=col_of,
        row_of=row_of,
        q=q,
        fixed_const=fixed_const,
        sigma_col=sigma_col,
        sigma_row=sigma_row,
        lookup_src=lookup_src,
        n_virtual=n_virtual,
    )


def witness_columns(table: VirtualTable, layout: CircuitLayout, blinding_seed: bytes = b"") -> np.ndarray:
    """(num_advice, n) object array of advice values; blinding rows filled
    deterministically from the seed (zk blinding; deterministic for the
    reproducibility tests, random seed in production use)."""
    import hashlib

    from ..ff.host import FR_MOD

    adv = np.zeros((layout.num_advice, layout.n), dtype=object)
    adv[layout.col_of, layout.row_of] = table.values
    usable = layout.n - BLINDING_ROWS
    for c in range(layout.num_advice):
        for r in range(usable, layout.n):
            h = hashlib.blake2b(blinding_seed + b"blind" + bytes([c]) + r.to_bytes(4, "little")).digest()
            adv[c, r] = int.from_bytes(h, "little") % FR_MOD
    return adv


def lookup_columns(table: VirtualTable, layout: CircuitLayout) -> np.ndarray:
    """(num_lookup_advice, n) object array: tagged cell values, 0 for unused
    slots (0 is a member of the range table)."""
    out = np.zeros((max(layout.num_lookup_advice, 0), layout.n), dtype=object)
    for lc in range(layout.num_lookup_advice):
        for lr in range(layout.n):
            src = layout.lookup_src[lc, lr]
            out[lc, lr] = int(table.values[src]) if src >= 0 else 0
    return out
