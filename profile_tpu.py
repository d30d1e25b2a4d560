"""On-chip profiling for the MSM/mulmod hot path (round-3 perf work).

Phases, each timed with a d2h readback sync (the axon tunnel's
block_until_ready can return early — same caveat as bench.py):
  1. HBM copy bandwidth (roofline denominator)
  2. mont_mul_pallas throughput vs BLOCK and impl
  3. padd_mixed_packed_pallas adds/s at MSM-like lane counts
  4. msm_packed @ 2^20 phase breakdown (sort/histogram, bucket loop,
     window sums, host Horner)

Usage: python profile_tpu.py [phase ...]   (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from paillier_halo2_tpu.ff import field_jax as f

sync = lambda x: np.asarray(x.reshape(-1)[:1])


def _sync_result(r):
    while isinstance(r, (tuple, list)):
        r = r[0]
    if hasattr(r, "reshape"):
        sync(r)


def timeit(fn, reps=5, warm=1):
    for _ in range(warm):
        r = fn()
    _sync_result(r)
    t0 = time.monotonic()
    for _ in range(reps):
        r = fn()
    _sync_result(r)
    return (time.monotonic() - t0) / reps


def phase_hbm():
    for mb in (64, 256):
        n = mb * 1024 * 1024 // 4
        x = jnp.arange(n, dtype=jnp.uint32)
        cp = jax.jit(lambda v: v + 1)
        t = timeit(lambda: cp(x), reps=10)
        print(f"hbm copy {mb}MB: {t*1e3:.2f} ms -> {2*mb/1024/t:.1f} GB/s (rw)")


def phase_mulmod():
    from paillier_halo2_tpu.ff import pallas_mulmod as pm

    N = 1 << 20
    rng = np.random.default_rng(1)
    a_np = rng.integers(0, 255, (32, N)).astype(np.uint32)
    b_np = rng.integers(0, 255, (32, N)).astype(np.uint32)
    a_np[31] &= 0x1F
    b_np[31] &= 0x1F
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)
    for impl in ("conv", "int8", "bf16"):
        for blk in (512, 1024, 2048, 4096):
            pm.BLOCK = blk
            try:
                t = timeit(lambda: pm.mont_mul_pallas(f.FR, a, b, impl=impl), reps=10)
                print(f"mulmod impl={impl} block={blk}: {t*1e3:.2f} ms -> {N/t/1e6:.1f} M/s")
            except Exception as e:
                print(f"mulmod impl={impl} block={blk}: FAIL {type(e).__name__} {str(e)[:120]}")
            finally:
                pm.mont_mul_pallas._clear_cache() if hasattr(pm.mont_mul_pallas, "_clear_cache") else None
    pm.BLOCK = 1024


def phase_padd():
    from paillier_halo2_tpu.ec import bn254
    from paillier_halo2_tpu.ec import host as ech

    L = 1 << 16
    rng = np.random.default_rng(2)
    # random-ish valid points: scalar multiples of G packed
    import random

    prng = random.Random(3)
    base_pts = [ech.g1_mul(ech.G1, prng.randrange(1, ech.R)) for _ in range(64)]
    idx = rng.integers(0, 64, L)
    pts = [base_pts[i] for i in idx]
    px, py, pinf = bn254.pack_affine(pts)
    packed = bn254.pack_points_dense(jnp.asarray(px), jnp.asarray(py))
    X = jnp.asarray(px)
    Y = jnp.asarray(py)
    Z = jnp.broadcast_to(jnp.asarray(f.pack_ints([bn254.SPEC.r_mod_p])), (32, L))
    qinf = jnp.zeros(L, bool)
    t = timeit(lambda: bn254.padd_mixed_packed((X, Y, Z), packed, qinf, nodouble=True), reps=5)
    print(f"padd_mixed_packed L=2^16: {t*1e3:.2f} ms -> {L/t/1e6:.2f} M adds/s "
          f"(= {L*11/t/1e6:.0f} M mulmod-equiv/s)")
    tj = timeit(lambda: bn254.padd((X, Y, Z), (X, Y, Z), nodouble=True), reps=5)
    print(f"padd jac+jac    L=2^16: {tj*1e3:.2f} ms -> {L/tj/1e6:.2f} M adds/s")


def phase_msm():
    from paillier_halo2_tpu.ec import host as ech
    from paillier_halo2_tpu.msm import pippenger as pip
    from paillier_halo2_tpu.plonk.srs import read_or_create_srs

    k = int(os.environ.get("PROF_MSM_LOG2", "20"))
    n = 1 << k
    srs = read_or_create_srs(k)
    rng = np.random.default_rng(1)
    hi = rng.integers(0, 2**63, (4, n), dtype=np.int64)
    scalars = [
        (int(x) | int(y) << 63 | int(z) << 126 | int(w) << 189) % ech.R
        for x, y, z, w in zip(*hi)
    ]
    sd = f.pack_ints(scalars)
    px, py, pinf, sdd = (jnp.asarray(x) for x in (srs.g1_px, srs.g1_py, srs.g1_inf, sd))
    sync(px)

    wb = int(os.environ.get("PAILLIER_TPU_MSM_WINDOW", "8"))
    # full
    t = timeit(lambda: pip.msm_packed(px, py, pinf, sdd, window_bits=wb), reps=1, warm=1)
    print(f"msm 2^{k} w={wb} full: {t:.2f} s -> {n/t/1e3:.1f} k pts/s")

    # phase: buckets only
    keys = pip._keys_from_digits(sdd, wb)
    tb = timeit(lambda: pip._bucket_accumulate(px, py, pinf, keys, wb), reps=1, warm=1)
    print(f"  bucket_accumulate: {tb:.2f} s")
    buckets = pip._bucket_accumulate(px, py, pinf, keys, wb)
    tw = timeit(lambda: pip._window_sums(buckets, 1 << wb), reps=1, warm=1)
    print(f"  window_sums: {tw:.2f} s")
    # sub-phases of bucket accumulate: sort only
    logn = max((n - 1).bit_length(), 1)
    lane = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def sort_only(keys):
        k2 = jnp.where(pinf[None, :], 0, keys.astype(jnp.int32))
        sk = jnp.sort((k2 << logn) | lane[None, :], axis=1)
        return sk

    ts = timeit(lambda: sort_only(keys), reps=2, warm=1)
    print(f"  key sort ({keys.shape[0]} windows): {ts:.2f} s")


if __name__ == "__main__":
    want = sys.argv[1:] or ["hbm", "mulmod", "padd", "msm"]
    print("devices:", jax.devices())
    for w in want:
        print(f"--- {w} ---")
        globals()[f"phase_{w}"]()
