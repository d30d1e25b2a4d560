"""pk/vk serialization round-trip: a proof created with a loaded key verifies
against the original vk (and vice versa) — the checkpoint/resume subsystem
(SURVEY.md section 5; the reference persists only the SRS cache)."""
import random

from paillier_halo2_tpu.bignum.host import paillier_enc_native
from paillier_halo2_tpu.gadgets.context import Context
from paillier_halo2_tpu.gadgets.range import RangeChip
from paillier_halo2_tpu.harness import PaillierEncryptionInput, paillier_enc_test
from paillier_halo2_tpu.plonk.keygen import keygen
from paillier_halo2_tpu.plonk.prover import create_proof
from paillier_halo2_tpu.plonk.serialize import load_proving_key, save_proving_key
from paillier_halo2_tpu.plonk.srs import read_or_create_srs
from paillier_halo2_tpu.plonk.verifier import verify_proof

RNG = random.Random(7)


def test_pk_roundtrip_proof_verifies(tmp_path):
    ENC, LIMB, K, LK = 16, 8, 10, 9
    n = RNG.getrandbits(ENC) | 1
    g, m, r = (RNG.getrandbits(ENC) for _ in range(3))
    inp = PaillierEncryptionInput(
        enc_bits=ENC, limb_bits=LIMB, n=n, g=g, m=m, r=r,
        res=paillier_enc_native(n, g, m, r),
    )

    def synth():
        ctx = Context()
        rc = RangeChip(ctx, LK)
        paillier_enc_test(ctx, rc, inp)
        return ctx.finalize()

    srs = read_or_create_srs(K)
    pk = keygen(synth(), K, LK, srs)
    path = str(tmp_path / "pk.npz")
    save_proving_key(pk, path)
    pk2 = load_proving_key(path, srs)

    assert pk2.vk.fixed_commitments() == pk.vk.fixed_commitments()
    proof = create_proof(pk2, synth())
    assert verify_proof(pk.vk, srs, proof)
