"""Distributed proving over the virtual 8-device CPU mesh (BASELINE.json
config 4): keygen + proof with MSM/NTT sharded over the mesh, verified by the
ordinary single-chip verifier, and bit-identical to the single-chip proof
(distribution must not change the transcript).

The CI-size test uses a single homomorphic-add circuit (k=10) — the virtual
mesh multiplies every per-shard cost by the device count on a 4-core host, so
the batched 4-encryption geometry (k=12, ~27 advice columns) runs only under
PAILLIER_TPU_HEAVY=1.
"""
import os
import random

import jax.numpy as jnp
import pytest

from paillier_halo2_tpu.bignum.host import paillier_add_native, paillier_enc_native
from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.ff.host import FR_MOD
from paillier_halo2_tpu.gadgets.context import Context
from paillier_halo2_tpu.gadgets.range import RangeChip
from paillier_halo2_tpu.harness import (
    PaillierAddCipherInput,
    PaillierEncryptionInput,
    paillier_enc_add_test,
    paillier_enc_test,
)
from paillier_halo2_tpu.mesh.ntt import ntt_natural
from paillier_halo2_tpu.mesh.sharding import make_mesh
from paillier_halo2_tpu.plonk.distributed import create_proof_sharded, keygen_sharded
from paillier_halo2_tpu.plonk.keygen import keygen
from paillier_halo2_tpu.plonk.prover import create_proof
from paillier_halo2_tpu.plonk.srs import read_or_create_srs
from paillier_halo2_tpu.plonk.verifier import verify_proof
from paillier_halo2_tpu.poly.ntt import ntt

RNG = random.Random(404)


def test_distributed_intt_batched_matches_single():
    mesh = make_mesh(8)
    k = 8
    n = 1 << k
    vals = [RNG.randrange(FR_MOD) for _ in range(3 * n)]
    x = f.to_mont(f.FR, jnp.asarray(f.pack_ints(vals)).reshape(32, 3, n))
    single = ntt(x, k, inverse=True)
    dist = ntt_natural(mesh, x, k, inverse=True)
    assert f.unpack_ints(dist) == f.unpack_ints(single)


def _add_table(seed: int):
    """Two homomorphic-add circuits (~1.6k rows, 2 advice columns at k=10) —
    small enough for the virtual mesh, wide enough to exercise multi-column
    layout under sharding."""
    ENC, LIMB, LK = 16, 8, 9
    ctx = Context()
    rc = RangeChip(ctx, LK)
    for i in range(2):
        rng = random.Random(seed + i)
        n = rng.getrandbits(ENC) | (1 << (ENC - 1)) | 1
        g, c1, c2 = (rng.getrandbits(ENC) for _ in range(3))
        inp = PaillierAddCipherInput(
            limb_bits=LIMB, enc_bits=ENC, n=n, g=g, c1=c1, c2=c2,
            res=paillier_add_native(n, c1, c2),
        )
        paillier_enc_add_test(ctx, rc, inp)
    return ctx.finalize(), LK


def _batched_enc_table(n_enc: int, seed: int):
    ENC, LIMB, LK = 16, 8, 9
    ctx = Context()
    rc = RangeChip(ctx, LK)
    for i in range(n_enc):
        rng = random.Random(seed + i)
        n = rng.getrandbits(ENC) | 1
        g, m, r = (rng.getrandbits(ENC) for _ in range(3))
        inp = PaillierEncryptionInput(
            enc_bits=ENC, limb_bits=LIMB, n=n, g=g, m=m, r=r,
            res=paillier_enc_native(n, g, m, r),
        )
        paillier_enc_test(ctx, rc, inp)
    return ctx.finalize(), LK


def _roundtrip_sharded_vs_single(table, lk, K):
    srs = read_or_create_srs(K)
    mesh = make_mesh(8)

    # The distributed prover must ACTUALLY run the sharded MSM for its
    # commits (round-3 weakness: commits silently fell back to the native
    # CPU backend before the mesh check; kzg.commit_many now checks the
    # active mesh first).
    from paillier_halo2_tpu.mesh import msm as mesh_msm

    calls = {"n": 0}
    orig = mesh_msm.msm_sharded_multi

    def counted(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    mesh_msm.msm_sharded_multi = counted
    try:
        pk_s = keygen_sharded(mesh, table, K, lk, srs)
        proof_s = create_proof_sharded(mesh, pk_s, table, blinding_seed=b"dist-test")
    finally:
        mesh_msm.msm_sharded_multi = orig
    assert calls["n"] >= 5, (
        f"sharded MSM invoked only {calls['n']} times — the distributed "
        "prover is not sharding its commitments"
    )
    assert verify_proof(pk_s.vk, srs, proof_s)

    pk = keygen(table, K, lk, srs)
    assert pk.vk.fixed_commitments() == pk_s.vk.fixed_commitments()
    proof = create_proof(pk, table, blinding_seed=b"dist-test")
    assert proof == proof_s, "distribution changed the transcript"


def test_sharded_proof_verifies_and_matches_single_chip():
    table, lk = _add_table(seed=2024)
    _roundtrip_sharded_vs_single(table, lk, K=10)


@pytest.mark.skipif(
    not os.environ.get("PAILLIER_TPU_HEAVY"),
    reason="4-encryption k=12 geometry needs ~1h on the 4-core virtual mesh",
)
def test_sharded_proof_batched_heavy():
    table, lk = _batched_enc_table(n_enc=4, seed=1000)
    _roundtrip_sharded_vs_single(table, lk, K=12)
