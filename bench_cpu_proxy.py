"""Reference-class CPU proxy (VERDICT r3 item 8 / BASELINE.md "targets to
self-establish"): run the exact reference bench geometry (ENC=128/LIMB=64,
k=14, lookup 13 — /root/reference/src/bench.rs:161-179) end-to-end on THIS
machine's CPU, with the NTT and MSM kernels on the native C++ backend
(native/bn254.cpp — the same algorithm class as halo2's rayon NTT/Pippenger).

No Rust toolchain exists in this environment, so this is the only same-machine
"what would a reference-class CPU prover do" baseline available; the TPU/CPU
ratio it yields is recorded in HEAVY_RUNS.md and surfaced by bench.py.

Usage: python bench_cpu_proxy.py [k] -> one JSON line on stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# CPU platform before jax loads a backend (same mechanism as tests/conftest).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from paillier_halo2_tpu.utils.cache import setup_compilation_cache
from paillier_halo2_tpu.utils.sysfix import raise_map_count

raise_map_count()
setup_compilation_cache()


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

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    LK, ENC, LIMB = K - 1, 128, 64
    log(f"devices: {jax.devices()} (CPU proxy, native NTT/MSM)")
    prng = random.Random(14)
    n = prng.getrandbits(ENC) | (1 << (ENC - 1)) | 1
    g, m, rr_ = (prng.getrandbits(ENC) for _ in range(3))
    inp = PaillierEncryptionInput(
        enc_bits=ENC, limb_bits=LIMB, n=n, g=g, m=m, r=rr_,
        res=paillier_enc_native(n, g, m, rr_),
    )
    t0 = time.monotonic()
    ctx = Context()
    rc = RangeChip(ctx, LK)
    paillier_enc_test(ctx, rc, inp)
    table = ctx.finalize()
    t_synth = time.monotonic() - t0
    log(f"circuit: {table.n_rows} rows, k={K} (synth {t_synth:.1f}s)")
    srs = read_or_create_srs(K)
    t0 = time.monotonic()
    pk = keygen(table, K, LK, srs)
    t_keygen = time.monotonic() - t0
    log(f"keygen: {t_keygen:.1f}s")
    t0 = time.monotonic()
    proof = create_proof(pk, table)
    t_cold = time.monotonic() - t0
    log(f"cold proof: {t_cold:.1f}s")
    t0 = time.monotonic()
    proof = create_proof(pk, table)
    t_warm = time.monotonic() - t0
    t0 = time.monotonic()
    ok = verify_proof(pk.vk, srs, proof)
    t_verify = time.monotonic() - t0
    out = {
        "backend": "cpu+native",
        "k": K,
        "enc_bits": ENC,
        "rows": int(table.n_rows),
        "keygen_s": round(t_keygen, 2),
        "proof_cold_s": round(t_cold, 2),
        "proof_s": round(t_warm, 2),
        "verify_s": round(t_verify, 3),
        "verified": bool(ok),
        "proof_bytes": len(proof),
        "proofs_per_sec": round(1.0 / t_warm, 5),
        "cpus": os.cpu_count(),
    }
    log(f"warm proof: {t_warm:.1f}s verify {t_verify:.2f}s ok={ok}")
    print(json.dumps(out), flush=True)
    # persist for bench.py to report the TPU/CPU ratio without re-running
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "params_fixtures", f"cpu_proxy_k{K}.json"), "w"
    ) as fh:
        json.dump(out, fh)


if __name__ == "__main__":
    main()
