"""Streaming MockProver (mock_prove_chunked) agrees with the one-shot jax
path and the host oracle — including catching injected violations — using a
tiny chunk size to force many chunks + overlap handling."""
import random

from paillier_halo2_tpu.bignum.host import paillier_enc_native
from paillier_halo2_tpu.gadgets import BigUintChip, EncryptionPublicKeyAssigned, PaillierChip
from paillier_halo2_tpu.gadgets.context import Context
from paillier_halo2_tpu.gadgets.range import RangeChip
from paillier_halo2_tpu.mock.prover import mock_prove_chunked, mock_prove_jax

RNG = random.Random(99)


def _table(tamper=False):
    ENC, LIMB, LK = 32, 16, 10
    n = RNG.getrandbits(ENC) | 1
    g, m, r = (RNG.getrandbits(ENC) for _ in range(3))
    res = paillier_enc_native(n, g, m, r)
    ctx = Context()
    rc = RangeChip(ctx, LK)
    bu = BigUintChip(rc, LIMB)
    pc = PaillierChip.construct(bu, ENC)
    pk = EncryptionPublicKeyAssigned(bu.assign_integer(n, ENC), bu.assign_integer(g, ENC))
    c = pc.encrypt(pk, bu.assign_integer(m, ENC), bu.assign_integer(r, ENC))
    exp = bu.assign_integer(res, ENC * 2)
    bu.assert_equal_fresh(c, exp)
    table = ctx.finalize()
    if tamper:
        # corrupt a gate-covered witness value and push a lookup cell out of
        # the table range — must surface as gate + lookup violations
        table.values[int(table.gates[7]) + 3] += 1
        table.values[int(table.lookups[3])] = 1 << LK
    return table, LK


def test_chunked_matches_oneshot_satisfied():
    table, lk = _table()
    one = mock_prove_jax(table, lk)
    chk = mock_prove_chunked(table, lk, chunk_rows=1 << 10)
    assert one.satisfied and chk.satisfied


def test_chunked_catches_violation():
    table, lk = _table(tamper=True)
    one = mock_prove_jax(table, lk)
    chk = mock_prove_chunked(table, lk, chunk_rows=1 << 10)
    assert not one.satisfied and not chk.satisfied
    # same violating gate rows found by both paths
    assert set(chk.gate_failures.tolist()) == set(one.gate_failures.tolist())
    assert set(chk.lookup_failures.tolist()) == set(one.lookup_failures.tolist())
