"""Large-encryption proving bench (BASELINE north-star path): ONE Paillier
encryption at ENC>=512 bits, full keygen + KZG proof + verify on the chip.

The 2048-bit north star needs multi-chip row sharding (see
docs/SIZING_2048.md); this script proves the largest geometry that fits a
single chip today and records proofs/sec for it.

Usage: python bench_bigenc.py [enc_bits] [k] -> one JSON line on stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from paillier_halo2_tpu.utils.cache import setup_compilation_cache
from paillier_halo2_tpu.utils.sysfix import raise_map_count

raise_map_count()
setup_compilation_cache()
import jax


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import random

    from paillier_halo2_tpu.bignum.host import paillier_enc_native
    from paillier_halo2_tpu.gadgets.context import Context
    from paillier_halo2_tpu.gadgets.range import RangeChip
    from paillier_halo2_tpu.harness import PaillierEncryptionInput, paillier_enc_test
    from paillier_halo2_tpu.plonk.keygen import keygen
    from paillier_halo2_tpu.plonk.prover import create_proof
    from paillier_halo2_tpu.plonk.srs import read_or_create_srs
    from paillier_halo2_tpu.plonk.verifier import verify_proof
    from paillier_halo2_tpu.poly import ops as _ops

    ENC = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    LK, LIMB = K - 1, 64
    log(f"devices: {jax.devices()}; enc={ENC} k={K} lookup={LK}")
    prng = random.Random(512)
    n = prng.getrandbits(ENC) | (1 << (ENC - 1)) | 1
    g, m, r = (prng.getrandbits(ENC) for _ in range(3))
    t0 = time.monotonic()
    inp = PaillierEncryptionInput(
        enc_bits=ENC, limb_bits=LIMB, n=n, g=g, m=m, r=r,
        res=paillier_enc_native(n, g, m, r),
    )
    ctx = Context()
    rc = RangeChip(ctx, LK)
    paillier_enc_test(ctx, rc, inp)
    table = ctx.finalize()
    t_synth = time.monotonic() - t0
    log(f"circuit: {table.n_rows} rows (synth {t_synth:.1f}s)")
    srs = read_or_create_srs(K)
    t0 = time.monotonic()
    pk = keygen(table, K, LK, srs)
    t_keygen = time.monotonic() - t0
    log(f"keygen: {t_keygen:.1f}s advice={pk.vk.num_advice}")
    t0 = time.monotonic()
    proof = create_proof(pk, table)
    t_cold = time.monotonic() - t0
    log(f"cold proof: {t_cold:.1f}s")
    _ops.reset_transfer_counts()
    t0 = time.monotonic()
    proof = create_proof(pk, table)
    t_warm = time.monotonic() - t0
    log(f"warm proof: {t_warm:.1f}s h2d={_ops.TRANSFER_COUNTS['h2d']} "
        f"d2h={_ops.TRANSFER_COUNTS['d2h']}")
    t0 = time.monotonic()
    ok = verify_proof(pk.vk, srs, proof)
    t_verify = time.monotonic() - t0
    print(
        json.dumps(
            {
                "enc_bits": ENC,
                "k": K,
                "rows": int(table.n_rows),
                "advice_cols": pk.vk.num_advice,
                "synth_s": round(t_synth, 2),
                "keygen_s": round(t_keygen, 2),
                "proof_cold_s": round(t_cold, 2),
                "proof_s": round(t_warm, 2),
                "verify_s": round(t_verify, 3),
                "verified": bool(ok),
                "proof_bytes": len(proof),
                "proofs_per_sec": round(1.0 / t_warm, 5),
            }
        ),
        flush=True,
    )
    assert ok, "proof rejected"


if __name__ == "__main__":
    main()
