"""BASELINE.json config 1: Paillier encryption circuit with a 2048-bit
modulus, MockProver witness/constraint check (the reference's cargo-test
path scaled to the target geometry). ~280M virtual rows — runs through the
streaming chunked MockProver. Heavy: gated behind PAILLIER_TPU_HEAVY=1
(≈10-30 min + ~40 GB host RAM); the 512-bit variant runs in CI as a scaled
stand-in through the same code path (chunk threshold forced down).
"""
import os
import random

import pytest

from paillier_halo2_tpu.bignum.host import paillier_enc_native
from paillier_halo2_tpu.gadgets import BigUintChip, EncryptionPublicKeyAssigned, PaillierChip
from paillier_halo2_tpu.gadgets.context import Context
from paillier_halo2_tpu.gadgets.range import RangeChip
from paillier_halo2_tpu.mock.prover import mock_prove_chunked

RNG = random.Random(2048)


def _enc_table(ENC, LIMB, LK):
    n = RNG.getrandbits(ENC) | (1 << (ENC - 1)) | 1
    g, m, r = (RNG.getrandbits(ENC) for _ in range(3))
    res = paillier_enc_native(n, g, m, r)
    ctx = Context()
    rc = RangeChip(ctx, LK)
    bu = BigUintChip(rc, LIMB)
    pc = PaillierChip.construct(bu, ENC)
    pk = EncryptionPublicKeyAssigned(bu.assign_integer(n, ENC), bu.assign_integer(g, ENC))
    c = pc.encrypt(pk, bu.assign_integer(m, ENC), bu.assign_integer(r, ENC))
    bu.assert_equal_fresh(c, bu.assign_integer(res, ENC * 2))
    return ctx.finalize(), LK


def test_mock_512bit_chunked():
    """512-bit modulus (10.5M rows) through the streaming mock path."""
    table, lk = _enc_table(512, 64, 15)
    res = mock_prove_chunked(table, lk, chunk_rows=1 << 21)
    res.assert_satisfied()


@pytest.mark.skipif(
    not os.environ.get("PAILLIER_TPU_HEAVY"),
    reason="2048-bit geometry needs ~40 GB RAM and tens of minutes; set PAILLIER_TPU_HEAVY=1",
)
def test_mock_2048bit_chunked():
    """The full config-1 geometry: 2048-bit modulus MockProver check."""
    table, lk = _enc_table(2048, 64, 15)
    res = mock_prove_chunked(table, lk, chunk_rows=1 << 22)
    res.assert_satisfied()
