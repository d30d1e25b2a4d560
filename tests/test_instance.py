"""Public-input (instance) columns — VERDICT r3 item 7.

The reference's own tests use no instances (SURVEY.md section 2.2: halo2's
proving-system layer has them [dep]); here `paillier_enc`-style statements
expose (n, g, res) publicly and the proof must be REJECTED when the claimed
public ciphertext is altered."""
import random

import pytest

from paillier_halo2_tpu.bignum.host import paillier_enc_native
from paillier_halo2_tpu.gadgets import (
    BigUintChip,
    Context,
    EncryptionPublicKeyAssigned,
    PaillierChip,
)
from paillier_halo2_tpu.gadgets.range import RangeChip
from paillier_halo2_tpu.plonk.keygen import keygen
from paillier_halo2_tpu.plonk.prover import create_proof
from paillier_halo2_tpu.plonk.srs import read_or_create_srs
from paillier_halo2_tpu.plonk.verifier import verify_proof

RNG = random.Random(23)
ENC, LIMB, K, LK = 16, 8, 10, 9


@pytest.fixture(scope="module")
def public_setup():
    n = RNG.getrandbits(ENC) | (1 << (ENC - 1)) | 1
    g, m, r = (RNG.getrandbits(ENC) for _ in range(3))
    res = paillier_enc_native(n, g, m, r)
    ctx = Context()
    rc = RangeChip(ctx, LK)
    bu = BigUintChip(rc, LIMB)
    pc = PaillierChip.construct(bu, ENC)
    n_a = bu.assign_integer(n, ENC)
    g_a = bu.assign_integer(g, ENC)
    pk_enc = EncryptionPublicKeyAssigned(n_a, g_a)
    c = pc.encrypt(pk_enc, bu.assign_integer(m, ENC), bu.assign_integer(r, ENC))
    res_a = bu.assign_integer(res, ENC * 2)
    bu.assert_equal_fresh(c, res_a)
    # expose the statement publicly: n, g limbs and the ciphertext limbs
    ctx.expose_public(n_a.limbs)
    ctx.expose_public(g_a.limbs)
    ctx.expose_public(res_a.limbs)
    table = ctx.finalize()
    publics = table.public_values()
    assert len(publics) == n_a.num_limbs() + g_a.num_limbs() + res_a.num_limbs()
    srs = read_or_create_srs(K)
    pk = keygen(table, K, LK, srs)
    assert pk.vk.num_instance == 1
    proof = create_proof(pk, table, blinding_seed=b"\x21" * 32)
    return pk, srs, proof, publics


def test_proof_verifies_with_true_publics(public_setup):
    pk, srs, proof, publics = public_setup
    assert verify_proof(pk.vk, srs, proof, instances=publics)


def test_altered_public_rejected(public_setup):
    pk, srs, proof, publics = public_setup
    bad = list(publics)
    bad[-1] = (bad[-1] + 1) % (1 << LIMB)  # claim a different ciphertext limb
    assert not verify_proof(pk.vk, srs, proof, instances=bad)


def test_missing_instances_rejected(public_setup):
    pk, srs, proof, _ = public_setup
    assert not verify_proof(pk.vk, srs, proof)


def test_wrong_length_rejected(public_setup):
    pk, srs, proof, publics = public_setup
    assert not verify_proof(pk.vk, srs, proof, instances=publics[:-1])
