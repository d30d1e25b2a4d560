"""Full-pipeline bench of the homomorphic-ADDITION circuit at the reference
bench geometry — the reference's second bench test
(`/root/reference/src/bench.rs:181-222`: ENC=128/LIMB=64, k=14, lookup 13,
keygen + KZG prove + verify). The encryption circuit's analog lives in
bench.py's proof phase; this records the add side (VERDICT r4 missing #5).

Usage: python bench_add.py [k] -> one JSON line on stdout.
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

    from paillier_halo2_tpu.bignum.host import paillier_add_native
    from paillier_halo2_tpu.gadgets.context import Context
    from paillier_halo2_tpu.gadgets.range import RangeChip
    from paillier_halo2_tpu.harness import PaillierAddCipherInput, paillier_enc_add_test
    from paillier_halo2_tpu.plonk.keygen import keygen
    from paillier_halo2_tpu.plonk.prover import create_proof
    from paillier_halo2_tpu.plonk.serialize import (
        load_proving_key,
        save_proving_key,
        table_fingerprint,
    )
    from paillier_halo2_tpu.plonk.srs import read_or_create_srs
    from paillier_halo2_tpu.plonk.verifier import verify_proof
    from paillier_halo2_tpu.poly import ops as _ops

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    LK, ENC, LIMB = K - 1, 128, 64
    log(f"devices: {jax.devices()}; add circuit enc={ENC} k={K} lookup={LK}")
    prng = random.Random(141)
    n = prng.getrandbits(ENC) | (1 << (ENC - 1)) | 1
    g, c1, c2 = (prng.getrandbits(ENC) for _ in range(3))
    inp = PaillierAddCipherInput(
        limb_bits=LIMB, enc_bits=ENC, n=n, g=g, c1=c1, c2=c2,
        res=paillier_add_native(n, c1, c2),
    )
    t0 = time.monotonic()
    ctx = Context()
    rc = RangeChip(ctx, LK)
    paillier_enc_add_test(ctx, rc, inp)
    table = ctx.finalize()
    t_synth = time.monotonic() - t0
    log(f"circuit: {table.n_rows} rows (synth {t_synth:.1f}s)")
    srs = read_or_create_srs(K)

    fp = table_fingerprint(table, K, LK)
    pk_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "params", f"pk_add_k{K}_enc{ENC}.npz",
    )
    pk, t_keygen = None, None
    if os.path.exists(pk_cache) and os.environ.get("BENCH_FORCE_KEYGEN") != "1":
        try:
            pk = load_proving_key(pk_cache, srs, expect_table_fp=fp)
            log("loaded cached pk")
        except Exception as e:
            log(f"pk cache unusable ({e}); fresh keygen")
    if pk is None:
        t0 = time.monotonic()
        pk = keygen(table, K, LK, srs)
        t_keygen = time.monotonic() - t0
        log(f"keygen: {t_keygen:.1f}s advice={pk.vk.num_advice}")
        try:
            save_proving_key(pk, pk_cache, table_fp=fp)
        except Exception as e:
            log(f"pk cache save failed: {e}")
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
                "circuit": "paillier_add",
                "enc_bits": ENC,
                "k": K,
                "rows": int(table.n_rows),
                "advice_cols": pk.vk.num_advice,
                "synth_s": round(t_synth, 2),
                "keygen_s": round(t_keygen, 2) if t_keygen is not None else None,
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
