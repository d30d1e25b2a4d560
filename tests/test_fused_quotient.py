"""The fused quotient-phase kernels (one jit dispatch per constraint slab —
the TPU hot path, plonk/prover.py::_fused_*) must produce byte-identical
proofs to the eager chain (the mesh/CPU path). Pinned here on CPU via the
PAILLIER_TPU_FUSED_QUOTIENT override."""
import os
import random

import pytest

from paillier_halo2_tpu.bignum.host import paillier_enc_native
from paillier_halo2_tpu.gadgets.context import Context
from paillier_halo2_tpu.gadgets.range import RangeChip
from paillier_halo2_tpu.harness import PaillierEncryptionInput, paillier_enc_test
from paillier_halo2_tpu.plonk.keygen import keygen
from paillier_halo2_tpu.plonk.prover import create_proof
from paillier_halo2_tpu.plonk.srs import read_or_create_srs
from paillier_halo2_tpu.plonk.verifier import verify_proof


def test_fused_quotient_matches_eager(monkeypatch):
    RNG = random.Random(31)
    ENC, LIMB, K, LK = 16, 8, 10, 9
    n = RNG.getrandbits(ENC) | (1 << (ENC - 1)) | 1
    g, m, r = (RNG.getrandbits(ENC) for _ in range(3))
    inp = PaillierEncryptionInput(
        enc_bits=ENC, limb_bits=LIMB, n=n, g=g, m=m, r=r,
        res=paillier_enc_native(n, g, m, r),
    )
    ctx = Context()
    rc = RangeChip(ctx, LK)
    paillier_enc_test(ctx, rc, inp)
    table = ctx.finalize()
    srs = read_or_create_srs(K)
    pk = keygen(table, K, LK, srs)
    seed = b"\x0f" * 32

    monkeypatch.setenv("PAILLIER_TPU_FUSED_QUOTIENT", "0")
    eager = create_proof(pk, table, blinding_seed=seed)
    monkeypatch.setenv("PAILLIER_TPU_FUSED_QUOTIENT", "1")
    fused = create_proof(pk, table, blinding_seed=seed)
    assert fused == eager, "fused quotient path changed the transcript"
    assert verify_proof(pk.vk, srs, fused)
