"""Round benchmark — run by the driver on real TPU hardware.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: Pippenger MSM throughput per chip (the dominant prover
kernel, SURVEY.md section 3.3 hot loops). Extras report the speed-of-light
mulmod throughput (north-star per-chip metric) and, when the full pipeline
is enabled, proof times on the reference bench geometry.

The reference publishes no numbers (BASELINE.md): vs_baseline compares to
the previous round's value when BENCH_r*.json exists, else 1.0.
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from paillier_halo2_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"devices: {jax.devices()}")

    from paillier_halo2_tpu.ff import field_jax as f
    from paillier_halo2_tpu.ff.pallas_mulmod import mont_mul_pallas

    on_tpu = jax.devices()[0].platform != "cpu"

    # ---- speed-of-light mulmod (Pallas on TPU, XLA elsewhere) -------------
    N = 1 << 20
    rng = np.random.default_rng(1)
    a_np = rng.integers(0, 255, (32, N)).astype(np.uint32)
    b_np = rng.integers(0, 255, (32, N)).astype(np.uint32)
    a_np[31] &= 0x1F
    b_np[31] &= 0x1F
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)

    def mm(x, y):
        if on_tpu:
            return mont_mul_pallas(f.FR, x, y)
        return f.mont_mul(f.FR, x, y)

    # sync via a tiny d2h readback: over the axon tunnel block_until_ready
    # can return before compute finishes, inflating throughput ~100x
    sync = lambda x: np.asarray(x[0, :1])
    r = mm(a, b)
    sync(r)
    t0 = time.monotonic()
    reps = 10
    for _ in range(reps):
        r = mm(r, b)
    sync(r)
    mulmod_per_s = N * reps / (time.monotonic() - t0)
    log(f"mulmod throughput: {mulmod_per_s/1e6:.1f} M/s")

    # ---- MSM throughput ----------------------------------------------------
    from paillier_halo2_tpu.ec import host as ech
    from paillier_halo2_tpu.msm.pippenger import msm_packed
    from paillier_halo2_tpu.plonk.srs import read_or_create_srs

    k_msm = int(os.environ.get("BENCH_MSM_LOG2", "17"))
    n_pts = 1 << k_msm
    # real distinct bases: the dev SRS powers-of-tau (generated on device,
    # cached under params/) — the exact base set every commitment uses
    srs = read_or_create_srs(k_msm)
    px, py, pinf = srs.g1_px, srs.g1_py, srs.g1_inf
    # uniform scalars mod r (four 64-bit draws per scalar): a skewed scalar
    # distribution concentrates some window's buckets and inflates the
    # bucket-loop round count — the bench must match the Fiat-Shamir regime
    hi = rng.integers(0, 2**63, (4, n_pts), dtype=np.int64)
    scalars = [
        (int(a) | int(b) << 63 | int(c) << 126 | int(d) << 189) % ech.R
        for a, b, c, d in zip(*hi)
    ]
    sd = f.pack_ints(scalars)
    px, py, pinf, sd = (jnp.asarray(x) for x in (px, py, pinf, sd))
    np.asarray(px[0, :1])  # force h2d before timing
    t0 = time.monotonic()
    out = msm_packed(px, py, pinf, sd)
    t_first = time.monotonic() - t0
    t0 = time.monotonic()
    out = msm_packed(px, py, pinf, sd)
    t_msm = time.monotonic() - t0
    log(f"msm 2^{k_msm}: first={t_first:.1f}s warm={t_msm:.2f}s")
    msm_points_per_s = n_pts / t_msm

    # ---- vs_baseline: previous round's value ------------------------------
    vs = 1.0
    prev = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")))
    if prev:
        try:
            with open(prev[-1]) as fh:
                last = json.load(fh)
            if last.get("unit") == "points/s/chip" and last.get("value"):
                vs = msm_points_per_s / float(last["value"])
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": f"msm_points_per_s_2^{k_msm}",
                "value": round(msm_points_per_s, 1),
                "unit": "points/s/chip",
                "vs_baseline": round(vs, 3),
                "mulmod_per_s": round(mulmod_per_s, 1),
                "msm_warm_s": round(t_msm, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
