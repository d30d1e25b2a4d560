"""Sharded witness generation (SURVEY.md section 2.3 row 4; the analog of
halo2-base's multithreaded SinglePhaseCoreManager witness pool,
/root/reference/src/bench.rs:3,38): per-instance synthesis in worker
processes, merged at assignment time; plus the fork-parallel limb packing.
"""
import random

import numpy as np

from paillier_halo2_tpu.bignum.host import paillier_enc_native
from paillier_halo2_tpu.gadgets import Context
from paillier_halo2_tpu.gadgets.context import SinglePhaseCoreManager, merge_tables
from paillier_halo2_tpu.gadgets.range import RangeChip
from paillier_halo2_tpu.harness import PaillierEncryptionInput, paillier_enc_test
from paillier_halo2_tpu.mock.prover import mock_prove_jax

ENC, LIMB, K, LK = 16, 8, 11, 8


def _synth_one(ctx, i):
    rc = RangeChip(ctx, LK)
    rng = random.Random(100 + i)
    n = rng.getrandbits(ENC) | (1 << (ENC - 1)) | 1
    g, m, r = (rng.getrandbits(ENC) for _ in range(3))
    inp = PaillierEncryptionInput(
        enc_bits=ENC, limb_bits=LIMB, n=n, g=g, m=m, r=r,
        res=paillier_enc_native(n, g, m, r),
    )
    paillier_enc_test(ctx, rc, inp)


def test_parallel_pool_equals_serial_merge():
    """Worker scheduling must not affect the merged table."""
    par = SinglePhaseCoreManager.synth_parallel(_synth_one, 4, n_workers=4)
    ser = SinglePhaseCoreManager.synth_parallel(_synth_one, 4, n_workers=1)
    assert par.n_rows == ser.n_rows
    assert [int(v) for v in par.values] == [int(v) for v in ser.values]
    for fld in ("gates", "copy_a", "copy_b", "const_idx", "lookups"):
        assert np.array_equal(getattr(par, fld), getattr(ser, fld)), fld
    assert [int(v) for v in par.const_val] == [int(v) for v in ser.const_val]


def test_merged_pool_circuit_mock_proves():
    table = SinglePhaseCoreManager.synth_parallel(_synth_one, 3, n_workers=3)
    mock_prove_jax(table, LK).assert_satisfied()


def test_merged_pool_proof_verifies():
    """Proof byte-determinism across worker counts follows from
    test_parallel_pool_equals_serial_merge (identical tables) plus the
    existing plonk determinism test; here: the merged table proves."""
    from paillier_halo2_tpu.plonk.keygen import keygen
    from paillier_halo2_tpu.plonk.prover import create_proof
    from paillier_halo2_tpu.plonk.srs import read_or_create_srs
    from paillier_halo2_tpu.plonk.verifier import verify_proof

    table = SinglePhaseCoreManager.synth_parallel(_synth_one, 2, n_workers=2)
    srs = read_or_create_srs(K)
    pk = keygen(table, K, LK, srs)
    proof = create_proof(pk, table, blinding_seed=b"pool")
    assert verify_proof(pk.vk, srs, proof)


def test_merge_tables_rebases_indices():
    def tiny(base_val):
        ctx = Context()
        c = ctx.load_witness([base_val, base_val + 1])
        ctx.add_gates([0])
        ctx.add_copies(c.idx[:1], c.idx[1:])
        ctx.add_lookups(c.idx)
        ctx.load_constants([base_val])
        return ctx.finalize()

    a, b = tiny(10), tiny(20)
    m = merge_tables([a, b])
    assert m.n_rows == a.n_rows + b.n_rows
    off = a.n_rows
    assert list(m.gates) == [0, off]
    assert list(m.copy_a) == [0, off]
    assert list(m.lookups) == [0, 1, off, off + 1]
    assert int(m.values[off]) == 20


def test_pack_values_parallel_matches_serial():
    from paillier_halo2_tpu.poly import ops

    rng = random.Random(5)
    vals = [rng.randrange(1 << 256) for _ in range(1000)]
    want = ops.pack_values(vals)
    old_min = ops._PACK_PARALLEL_MIN
    ops._PACK_PARALLEL_MIN = 64
    try:
        got = ops.pack_values(vals)
    finally:
        ops._PACK_PARALLEL_MIN = old_min
    assert np.array_equal(got, want)
