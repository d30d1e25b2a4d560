"""Batched-proving bench (BASELINE.json config 4): B independent Paillier
encryptions in ONE circuit, full keygen + KZG proof + verify; reports
proofs/sec (= B / proof_time) and per-phase stats.

Usage: python bench_batch.py [B] [k] [lookup_bits] [enc_bits]
Defaults: B=64, k=17, lookup=16, enc=128 on TPU (the config-4 shape at
single-chip scale; add the mesh with PAILLIER_TPU_MESH=8 to shard MSM/NTT).
"""
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from paillier_halo2_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()
import jax


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def synth_one(ctx, i, lookup_bits=16, enc_bits=128, limb_bits=64, seed=1):
    """One encryption instance in its own Context (witness-pool shard).
    TOP-LEVEL (picklable) so synth_parallel can ship it to SPAWN workers —
    jax is already imported here, so fork workers are off the table and a
    closure would silently force serial synthesis (round-3 weakness #5)."""
    import random as _random

    from paillier_halo2_tpu.bignum.host import paillier_enc_native
    from paillier_halo2_tpu.gadgets.range import RangeChip
    from paillier_halo2_tpu.harness.circuits import (
        PaillierEncryptionInput,
        paillier_enc_test,
    )

    rc = RangeChip(ctx, lookup_bits)
    rng = _random.Random(seed + i)
    n = rng.getrandbits(enc_bits) | (1 << (enc_bits - 1)) | 1
    g, m, r = (rng.getrandbits(enc_bits) for _ in range(3))
    inp = PaillierEncryptionInput(
        enc_bits=enc_bits, limb_bits=limb_bits, n=n, g=g, m=m, r=r,
        res=paillier_enc_native(n, g, m, r),
    )
    paillier_enc_test(ctx, rc, inp)


def main():
    import functools

    from paillier_halo2_tpu.plonk.keygen import keygen
    from paillier_halo2_tpu.plonk.prover import create_proof
    from paillier_halo2_tpu.plonk.srs import read_or_create_srs
    from paillier_halo2_tpu.plonk.verifier import verify_proof

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    LK = int(sys.argv[3]) if len(sys.argv) > 3 else K - 1
    ENC = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    LIMB = 64 if ENC % 64 == 0 else 88
    log(f"devices: {jax.devices()}; B={B} k={K} lookup={LK} enc={ENC}")

    from paillier_halo2_tpu.gadgets.context import SinglePhaseCoreManager

    t0 = time.monotonic()
    table = SinglePhaseCoreManager.synth_parallel(
        functools.partial(synth_one, lookup_bits=LK, enc_bits=ENC, limb_bits=LIMB),
        B,
    )
    t_synth = time.monotonic() - t0
    log(f"synthesized {table.n_rows} rows in {t_synth:.1f}s "
        f"(witness pool, {min(os.cpu_count() or 1, B)} spawn workers)")

    srs = read_or_create_srs(K)
    t0 = time.monotonic()
    pk = keygen(table, K, LK, srs)
    t_keygen = time.monotonic() - t0
    log(f"keygen {t_keygen:.1f}s (advice columns: {pk.vk.num_advice})")

    mesh_n = int(os.environ.get("PAILLIER_TPU_MESH", "0"))

    def prove():
        if mesh_n > 1:
            from paillier_halo2_tpu.mesh.sharding import make_mesh
            from paillier_halo2_tpu.plonk.distributed import create_proof_sharded

            return create_proof_sharded(make_mesh(mesh_n), pk, table)
        return create_proof(pk, table)

    t0 = time.monotonic()
    proof = prove()
    t_cold = time.monotonic() - t0
    log(f"cold proof: {t_cold:.1f}s")
    t0 = time.monotonic()
    proof = prove()
    t_proof = time.monotonic() - t0
    log(f"warm proof: {t_proof:.1f}s")
    t0 = time.monotonic()
    ok = verify_proof(pk.vk, srs, proof)
    t_verify = time.monotonic() - t0
    assert ok, "proof rejected"

    print(
        json.dumps(
            {
                "batch": B,
                "k": K,
                "enc_bits": ENC,
                "rows": int(table.n_rows),
                "synth_s": round(t_synth, 2),
                "keygen_s": round(t_keygen, 2),
                "proof_cold_s": round(t_cold, 2),
                "proof_s": round(t_proof, 2),
                "verify_s": round(t_verify, 3),
                "proof_bytes": len(proof),
                "proofs_per_sec": round(B / t_proof, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
