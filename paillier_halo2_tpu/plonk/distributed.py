"""Distributed proving — the multi-chip path of BASELINE.json config 4/5
(batched circuits at large k, MSM/NTT sharded over the mesh; SURVEY.md
section 2.3). No reference analogue: the reference's only parallelism is
rayon threads in one process.

Mechanism: `poly.ops.proving_mesh` activates mesh routing for the two
communication-heavy kernels inside the ordinary `create_proof`/`keygen` code
path —

- every coefficient<->evaluation transform of size n with d^2 | n runs as the
  four-step distributed NTT (local butterflies + two all-to-alls over ICI),
- every commitment MSM with d | n runs with the point axis row-sharded per
  chip, per-chip Pippenger buckets, and a log-depth cross-chip point-add tree

— while elementwise field work stays in plain jnp ops that XLA partitions.
The transcript, challenges, and proof bytes are bit-identical to the
single-chip prover: distribution changes the schedule, not the math
(determinism check in tests/test_distributed.py).
"""
from __future__ import annotations

from ..gadgets.context import VirtualTable
from ..poly import ops
from .keygen import ProvingKey, keygen
from .prover import create_proof
from .srs import SRS


def keygen_sharded(mesh, table: VirtualTable, k: int, lookup_bits: int, srs: SRS) -> ProvingKey:
    with ops.proving_mesh(mesh):
        return keygen(table, k, lookup_bits, srs)


def create_proof_sharded(
    mesh, pk: ProvingKey, table: VirtualTable, blinding_seed: bytes | None = None
) -> bytes:
    with ops.proving_mesh(mesh):
        return create_proof(pk, table, blinding_seed)
