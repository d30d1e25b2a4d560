"""End-to-end gadget tests — reproduce the reference's two MockProver tests
(SURVEY.md section 4): encryption at ENC=128/LIMB=64 and addition at
ENC=264/LIMB=88, random inputs vs native oracles, witness equality asserted
both at synthesis time and as circuit constraints.
"""
import random

import pytest

from paillier_halo2_tpu.bignum.host import paillier_add_native, paillier_enc_native
from paillier_halo2_tpu.gadgets import (
    BigUintChip,
    EncryptionPublicKeyAssigned,
    PaillierChip,
)
from paillier_halo2_tpu.harness.base_test import base_test

RNG = random.Random(20260817)


def enc_circuit(ctx, range_chip, enc_bits, limb_bits, n, g, m, r, res):
    """Mirror of paillier_enc_circuit (/root/reference/src/paillier.rs:120-165)."""
    biguint = BigUintChip(range_chip, limb_bits)
    paillier = PaillierChip.construct(biguint, enc_bits)

    n_a = biguint.assign_integer(n, enc_bits)
    g_a = biguint.assign_integer(g, enc_bits)
    pk = EncryptionPublicKeyAssigned(n=n_a, g=g_a)
    m_a = biguint.assign_integer(m, enc_bits)
    r_a = biguint.assign_integer(r, enc_bits)

    c_a = paillier.encrypt(pk, m_a, r_a)

    res_a = biguint.assign_integer(res, enc_bits * 2)
    assert c_a.value() == res_a.value()  # witness-level assert_eq
    biguint.assert_equal_fresh(c_a, res_a)  # constraint-level


def add_circuit(ctx, range_chip, enc_bits, limb_bits, n, g, c1, c2, res):
    """Mirror of paillier_enc_add (/root/reference/src/paillier.rs:191-238)."""
    biguint = BigUintChip(range_chip, limb_bits)
    paillier = PaillierChip.construct(biguint, enc_bits)

    n_a = biguint.assign_integer(n, enc_bits)
    g_a = biguint.assign_integer(g, enc_bits)
    pk = EncryptionPublicKeyAssigned(n=n_a, g=g_a)
    c1_a = biguint.assign_integer(c1, enc_bits)
    c2_a = biguint.assign_integer(c2, enc_bits)

    c_a = paillier.add(pk, c1_a, c2_a)

    res_a = biguint.assign_integer(res, enc_bits * 2)
    assert c_a.value() == res_a.value()
    biguint.assert_equal_fresh(c_a, res_a)


def test_paillier_encryption_small():
    """Quick geometry (32/16) for fast iteration; same code path as the full one."""
    ENC, LIMB = 32, 16
    n = RNG.getrandbits(ENC) | 1
    g = RNG.getrandbits(ENC)
    m = RNG.getrandbits(ENC)
    r = RNG.getrandbits(ENC)
    res = paillier_enc_native(n, g, m, r)
    out = (
        base_test()
        .k(14)
        .lookup_bits(13)
        .expect_satisfied(True)
        .run(lambda ctx, rc: enc_circuit(ctx, rc, ENC, LIMB, n, g, m, r, res))
    )
    assert out.mock.satisfied


def test_paillier_encryption():
    """(/root/reference/src/paillier.rs:113-182): ENC=128, LIMB=64, k=16."""
    ENC, LIMB = 128, 64
    n = RNG.getrandbits(ENC) | 1
    g = RNG.getrandbits(ENC)
    m = RNG.getrandbits(ENC)
    r = RNG.getrandbits(ENC)
    res = paillier_enc_native(n, g, m, r)
    out = (
        base_test()
        .k(16)
        .lookup_bits(15)
        .expect_satisfied(True)
        .run(lambda ctx, rc: enc_circuit(ctx, rc, ENC, LIMB, n, g, m, r, res))
    )
    assert out.mock.satisfied
    assert out.config.num_advice >= 1


def test_encryption_addition():
    """(/root/reference/src/paillier.rs:184-259): ENC=264, LIMB=88, k=16."""
    ENC, LIMB = 264, 88
    n = RNG.getrandbits(ENC) | 1
    g = RNG.getrandbits(ENC)
    c1 = RNG.getrandbits(ENC)
    c2 = RNG.getrandbits(ENC)
    res = paillier_add_native(n, c1, c2)
    out = (
        base_test()
        .k(16)
        .lookup_bits(15)
        .expect_satisfied(True)
        .run(lambda ctx, rc: add_circuit(ctx, rc, ENC, LIMB, n, g, c1, c2, res))
    )
    assert out.mock.satisfied


def test_host_and_jax_mock_agree():
    ENC, LIMB = 32, 16
    n = RNG.getrandbits(ENC) | 1
    g, c1, c2 = (RNG.getrandbits(ENC) for _ in range(3))
    res = paillier_add_native(n, c1, c2)
    closure = lambda ctx, rc: add_circuit(ctx, rc, ENC, LIMB, n, g, c1, c2, res)
    out_host = base_test().backend("host").run(closure)
    out_jax = base_test().backend("jax").run(closure)
    assert out_host.mock.satisfied and out_jax.mock.satisfied


def test_mock_catches_bad_witness():
    """Negative test: a wrong expected result must violate constraints."""
    ENC, LIMB = 32, 16
    n = RNG.getrandbits(ENC) | 1
    g, c1, c2 = (RNG.getrandbits(ENC) for _ in range(3))
    res = paillier_add_native(n, c1, c2)
    bad = (res + 1) % (n * n)

    def closure(ctx, rc):
        biguint = BigUintChip(rc, LIMB)
        paillier = PaillierChip.construct(biguint, ENC)
        n_a = biguint.assign_integer(n, ENC)
        g_a = biguint.assign_integer(g, ENC)
        pk = EncryptionPublicKeyAssigned(n=n_a, g=g_a)
        c1_a = biguint.assign_integer(c1, ENC)
        c2_a = biguint.assign_integer(c2, ENC)
        c_a = paillier.add(pk, c1_a, c2_a)
        bad_a = biguint.assign_integer(bad, ENC * 2)
        # Wire the (false) equality as copy constraints only — witness values
        # differ, so the copy constraint family must report a violation.
        ctx.add_copies(c_a.limbs.idx, bad_a.limbs.idx)

    out = base_test().expect_satisfied(False).run(closure)
    assert not out.mock.satisfied
