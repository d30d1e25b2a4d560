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

# K=10 (was 11): the proof test shares the suite's dominant k=10 shape
# family instead of compiling a one-off k=11 prover graph set (VERDICT r3
# item 10 — the suite's wall time is XLA:CPU compiles of distinct shapes)
ENC, LIMB, K, LK = 16, 8, 10, 8


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


def test_pack_values_fast_path_matches_slow():
    """The vectorized uint64 fast path (all values < 2^63) must agree with
    the generic big-int path, including shape handling and round-trips."""
    from paillier_halo2_tpu.poly import ops

    rng = random.Random(5)
    small = [rng.randrange(1 << 63) for _ in range(1000)] + [0, 1, (1 << 63) - 1]
    got = ops.pack_values(small)
    assert ops.unpack_values(got) == small
    # forcing the slow path by appending one big value must not change the
    # digits of the small ones
    big = small + [rng.randrange(1 << 256)]
    got_big = ops.pack_values(big)
    assert np.array_equal(got_big[:, : len(small)], got)
    assert ops.unpack_values(got_big) == big
    # 2-D object arrays keep their batch shape
    arr = np.array([[rng.randrange(1 << 40) for _ in range(5)] for _ in range(3)], dtype=object)
    g3 = ops.pack_values(arr)
    assert g3.shape[1:] == (3, 5)
    assert ops.unpack_values(g3) == [int(v) for v in arr.reshape(-1)]
