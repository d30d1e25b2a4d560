"""Public bench-circuit API parity (/root/reference/src/bench.rs:11-117):
`PaillierEncryptionInput` / `PaillierAddCipherInput` bundles and the reusable
`paillier_enc_test` / `paillier_enc_add_test` builders, driven through
`base_test().run(...)` exactly as an external consumer would."""
import random

from paillier_halo2_tpu.bignum.host import paillier_add_native, paillier_enc_native
from paillier_halo2_tpu.harness import (
    PaillierAddCipherInput,
    PaillierEncryptionInput,
    base_test,
    paillier_enc_add_test,
    paillier_enc_test,
)

RNG = random.Random(20260818)


def test_paillier_enc_test_bundle():
    ENC, LIMB = 32, 16
    n = RNG.getrandbits(ENC) | 1
    g, m, r = (RNG.getrandbits(ENC) for _ in range(3))
    inp = PaillierEncryptionInput(
        enc_bits=ENC, limb_bits=LIMB, n=n, g=g, m=m, r=r,
        res=paillier_enc_native(n, g, m, r),
    )
    out = base_test().k(11).lookup_bits(10).expect_satisfied(True).run(
        lambda ctx, rc: paillier_enc_test(ctx, rc, inp)
    )
    assert out.mock.satisfied


def test_paillier_enc_add_test_bundle():
    ENC, LIMB = 32, 16
    n = RNG.getrandbits(ENC) | 1
    g, c1, c2 = (RNG.getrandbits(ENC) for _ in range(3))
    inp = PaillierAddCipherInput(
        limb_bits=LIMB, enc_bits=ENC, n=n, g=g, c1=c1, c2=c2,
        res=paillier_add_native(n, c1, c2),
    )
    out = base_test().k(11).lookup_bits(10).expect_satisfied(True).run(
        lambda ctx, rc: paillier_enc_add_test(ctx, rc, inp)
    )
    assert out.mock.satisfied
