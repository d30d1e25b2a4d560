"""End-to-end KZG proof generation + verification on a small Paillier circuit
(the reference's bench path, /root/reference/src/bench.rs:161-178, at reduced
geometry for test speed)."""
import random

import pytest

from paillier_halo2_tpu.bignum.host import paillier_add_native
from paillier_halo2_tpu.gadgets import (
    BigUintChip,
    Context,
    EncryptionPublicKeyAssigned,
    PaillierChip,
)
from paillier_halo2_tpu.gadgets.range import RangeChip
from paillier_halo2_tpu.mock.prover import mock_prove_host
from paillier_halo2_tpu.plonk.keygen import keygen
from paillier_halo2_tpu.plonk.prover import create_proof
from paillier_halo2_tpu.plonk.srs import generate_srs
from paillier_halo2_tpu.plonk.verifier import verify_proof

RNG = random.Random(777)

K = 10
LOOKUP_BITS = 8
ENC, LIMB = 16, 8


def _add_circuit(ctx, rc, inp):
    """Homomorphic-add circuit (1 mul_mod) — small enough for a fast CPU
    end-to-end proof; the encryption circuit is exercised on TPU in bench."""
    n, g, c1, c2, res = inp
    bu = BigUintChip(rc, LIMB)
    pc = PaillierChip.construct(bu, ENC)
    pk = EncryptionPublicKeyAssigned(bu.assign_integer(n, ENC), bu.assign_integer(g, ENC))
    c = pc.add(pk, bu.assign_integer(c1, ENC), bu.assign_integer(c2, ENC))
    res_a = bu.assign_integer(res, ENC * 2)
    assert c.value() == res_a.value()
    bu.assert_equal_fresh(c, res_a)


def _build(inp):
    ctx = Context()
    rc = RangeChip(ctx, LOOKUP_BITS)
    _add_circuit(ctx, rc, inp)
    return ctx.finalize()


@pytest.fixture(scope="module")
def proof_setup():
    n = RNG.getrandbits(ENC) | (1 << (ENC - 1)) | 1
    g, c1, c2 = (RNG.getrandbits(ENC) for _ in range(3))
    res = paillier_add_native(n, c1, c2)
    table = _build((n, g, c1, c2, res))
    assert mock_prove_host(table, LOOKUP_BITS).satisfied
    srs = generate_srs(K, seed=b"plonk-test")
    pk = keygen(table, K, LOOKUP_BITS, srs)
    proof = create_proof(pk, table, blinding_seed=b"test-blind")
    return srs, pk, proof, table


def test_proof_verifies(proof_setup):
    srs, pk, proof, _ = proof_setup
    assert verify_proof(pk.vk, srs, proof)


def test_proof_deterministic(proof_setup):
    srs, pk, proof, table = proof_setup
    proof2 = create_proof(pk, table, blinding_seed=b"test-blind")
    assert proof == proof2


def test_default_blinding_is_random(proof_setup):
    """blinding_seed=None (default) must draw fresh randomness: two proofs of
    the same statement differ byte-wise but both verify (VERDICT round-1
    item 9 — zero-knowledge requires non-derivable blinders)."""
    srs, pk, _, table = proof_setup
    p1 = create_proof(pk, table)
    p2 = create_proof(pk, table)
    assert p1 != p2
    assert verify_proof(pk.vk, srs, p1) and verify_proof(pk.vk, srs, p2)


def test_quotient_degree_selfcheck(proof_setup, monkeypatch):
    """The t(X) coefficient tail past n_pieces*n must be identically zero —
    a degree overflow is a silent soundness bug (VERDICT round-1 item 10).
    PAILLIER_TPU_SELFCHECK makes the prover raise on overflow; also checks
    the GWC fold/division identities."""
    srs, pk, _, table = proof_setup
    monkeypatch.setenv("PAILLIER_TPU_SELFCHECK", "1")
    proof = create_proof(pk, table, blinding_seed=b"degree-check")
    assert verify_proof(pk.vk, srs, proof)


def test_quotient_degree_selfcheck_multicolumn(monkeypatch):
    """Same selfcheck on a circuit wide enough to span several advice columns
    (multi-column gate emission + permutation chunk chains)."""
    rng = random.Random(31337)
    ctx = Context()
    rc = RangeChip(ctx, LOOKUP_BITS)
    for _ in range(3):
        n = rng.getrandbits(ENC) | (1 << (ENC - 1)) | 1
        g, c1, c2 = (rng.getrandbits(ENC) for _ in range(3))
        _add_circuit(ctx, rc, (n, g, c1, c2, paillier_add_native(n, c1, c2)))
    table = ctx.finalize()
    k = 9  # force n_rows / usable > 1 -> multiple advice columns
    from paillier_halo2_tpu.plonk.params import ConfigParams

    cfg = ConfigParams.size_for(table, k, LOOKUP_BITS)
    assert cfg.num_advice >= 2, "geometry no longer multi-column; shrink k"
    srs = generate_srs(k, seed=b"plonk-test-mc")
    pk = keygen(table, k, LOOKUP_BITS, srs)
    monkeypatch.setenv("PAILLIER_TPU_SELFCHECK", "1")
    proof = create_proof(pk, table, blinding_seed=b"degree-check-mc")
    assert verify_proof(pk.vk, srs, proof)


def test_gwc_multiopen_roundtrip(proof_setup, monkeypatch):
    """The legacy GWC multi-open prover/verifier pair (selected by keys with
    vk.multiopen == 'gwc' — every pre-round-4 serialized key deserializes to
    it, plonk/serialize.py) must stay proof-roundtrip-correct even though
    keygen now defaults to SHPLONK (ADVICE r4: the rewritten GWC path had
    zero coverage)."""
    srs, _, _, table = proof_setup
    monkeypatch.setenv("PAILLIER_TPU_MULTIOPEN", "gwc")
    pk = keygen(table, K, LOOKUP_BITS, srs)
    assert pk.vk.multiopen == "gwc"
    # selfcheck also exercises the GWC fold/division identities in-flight
    monkeypatch.setenv("PAILLIER_TPU_SELFCHECK", "1")
    proof = create_proof(pk, table, blinding_seed=b"gwc-check")
    assert verify_proof(pk.vk, srs, proof)
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not verify_proof(pk.vk, srs, bytes(bad))


def test_unsatisfiable_witness_fails_fast(proof_setup):
    """create_proof on a tampered (unsatisfiable) witness must raise the
    localizing closing-check assertion by default — not silently emit an
    invalid proof (ADVICE r4: the checks were accidentally gated behind
    PAILLIER_TPU_SELFCHECK)."""
    import dataclasses

    import numpy as np

    _, pk, _, table = proof_setup
    values = np.array(table.values, dtype=object, copy=True)
    # break a copy constraint: make two copy-linked cells disagree
    a, b = int(table.copy_a[0]), int(table.copy_b[0])
    values[b] = (int(values[b]) + 1) % (1 << 8)
    bad_table = dataclasses.replace(table, values=values)
    with pytest.raises(AssertionError, match="unsatisfied"):
        create_proof(pk, bad_table, blinding_seed=b"bad-witness")


def test_tampered_proof_rejected(proof_setup):
    srs, pk, proof, _ = proof_setup
    for pos in [0, len(proof) // 2, len(proof) - 1]:
        bad = bytearray(proof)
        bad[pos] ^= 1
        assert not verify_proof(pk.vk, srs, bytes(bad))


def test_truncated_proof_rejected(proof_setup):
    srs, pk, proof, _ = proof_setup
    assert not verify_proof(pk.vk, srs, proof[:-32])
    assert not verify_proof(pk.vk, srs, proof + b"\x00" * 32)
