"""Phase-level profile of the k=14 reference-geometry proof on the chip.

Runs keygen + one cold + N warm proofs with PAILLIER_TPU_TRACE=1 so the
prover's PhaseTimer marks print per-phase deltas; reports transfer counts.

Usage: python profile_proof.py [k] [warm_reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("PAILLIER_TPU_TRACE", "1")

from paillier_halo2_tpu.utils.cache import setup_compilation_cache
from paillier_halo2_tpu.utils.sysfix import raise_map_count

raise_map_count()
setup_compilation_cache()
import jax


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

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    LK, ENC, LIMB = K - 1, 128, 64
    print(f"devices: {jax.devices()}", flush=True)
    prng = random.Random(14)
    n = prng.getrandbits(ENC) | (1 << (ENC - 1)) | 1
    g, m, rr_ = (prng.getrandbits(ENC) for _ in range(3))
    inp = PaillierEncryptionInput(
        enc_bits=ENC, limb_bits=LIMB, n=n, g=g, m=m, r=rr_,
        res=paillier_enc_native(n, g, m, rr_),
    )
    ctx = Context()
    rc = RangeChip(ctx, LK)
    paillier_enc_test(ctx, rc, inp)
    table = ctx.finalize()
    print(f"circuit: {table.n_rows} rows, k={K}", flush=True)
    srs = read_or_create_srs(K)
    t0 = time.monotonic()
    pk = keygen(table, K, LK, srs)
    print(f"keygen: {time.monotonic()-t0:.1f}s advice={pk.vk.num_advice}", flush=True)
    t0 = time.monotonic()
    proof = create_proof(pk, table)
    print(f"cold proof: {time.monotonic()-t0:.1f}s", flush=True)
    for i in range(REPS):
        _ops.reset_transfer_counts()
        t0 = time.monotonic()
        proof = create_proof(pk, table)
        dt = time.monotonic() - t0
        print(
            f"warm proof {i}: {dt:.2f}s h2d={_ops.TRANSFER_COUNTS['h2d']} "
            f"d2h={_ops.TRANSFER_COUNTS['d2h']}",
            flush=True,
        )
    t0 = time.monotonic()
    ok = verify_proof(pk.vk, srs, proof)
    print(f"verify: {time.monotonic()-t0:.2f}s ok={ok} bytes={len(proof)}", flush=True)


if __name__ == "__main__":
    main()
