"""Scaling-efficiency sweep (BASELINE.json config 5): sharded-MSM throughput
at 1 / 2 / 4 / ... devices, plus a 2-host x (d/2)-chip 2D-mesh point, printing
efficiency vs the 1-device baseline.

On real multi-chip hardware this measures ICI/DCN scaling; on a single chip
or the virtual CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) it validates the same
SPMD programs functionally and reports the (hardware-meaningless) timings.

Usage: python bench_scaling.py [log2_points]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Self-provision the virtual CPU mesh when the active backend is a single
# chip: the axon sitecustomize pins JAX_PLATFORMS=axon, so an env-var
# prefix alone cannot select the 8-device CPU platform (observed round 5 —
# the sweep silently ran d=1-only on the TPU).
_want = int(os.environ.get("BENCH_SCALING_DEVICES", "8"))
import __graft_entry__

__graft_entry__._ensure_devices(_want)

from paillier_halo2_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from paillier_halo2_tpu.ff import field_jax as f
    from paillier_halo2_tpu.mesh.msm import msm_sharded_multi
    from paillier_halo2_tpu.mesh.sharding import make_mesh, make_mesh_2d
    from paillier_halo2_tpu.plonk.srs import read_or_create_srs

    k = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("BENCH_MSM_LOG2", "14"))
    n = 1 << k
    n_dev = len(jax.devices())
    log(f"devices: {n_dev} x {jax.devices()[0].platform}; MSM size 2^{k}")

    srs = read_or_create_srs(k)
    px, py, pinf = srs.g1_px, srs.g1_py, srs.g1_inf
    rng = np.random.default_rng(7)
    from paillier_halo2_tpu.ec import host as ech

    scalars = [int(x) % ech.R for x in rng.integers(0, 1 << 62, n).tolist()]
    # widen to full 254-bit range via 4 draws
    scalars = [
        (a | (b << 62) | (c << 124) | (d << 186)) % ech.R
        for a, b, c, d in zip(
            scalars,
            (int(x) for x in rng.integers(0, 1 << 62, n)),
            (int(x) for x in rng.integers(0, 1 << 62, n)),
            (int(x) for x in rng.integers(0, 1 << 62, n)),
        )
    ]
    sd = jnp.asarray(f.pack_ints(scalars))[None]
    wb = int(os.environ.get("PAILLIER_TPU_MSM_WINDOW", "8"))

    def run_at(mesh, label):
        t0 = time.monotonic()
        r = msm_sharded_multi(mesh, px, py, pinf, sd, window_bits=wb)
        warm = time.monotonic() - t0
        t0 = time.monotonic()
        r = msm_sharded_multi(mesh, px, py, pinf, sd, window_bits=wb)
        dt = time.monotonic() - t0
        log(f"{label}: {dt*1e3:.0f} ms ({n/dt/1e3:.1f} Kpts/s; warm-up {warm:.1f}s)")
        return dt, r[0]

    results = {}
    expected = None
    d = 1
    while d <= n_dev:
        dt, r = run_at(make_mesh(d), f"{d} device(s)")
        if expected is None:
            expected = r
        else:
            assert r == expected, f"MSM result differs at {d} devices"
        results[str(d)] = dt
        d *= 2
    if n_dev >= 4:
        dt, r = run_at(make_mesh_2d(2, n_dev // 2), f"2 hosts x {n_dev//2} chips (2D)")
        assert r == expected
        results["2x%d" % (n_dev // 2)] = dt

    base = results["1"]
    eff = {
        kk: round(base / (v * int(kk.split("x")[0]) * (int(kk.split("x")[1]) if "x" in kk else 1)), 3)
        for kk, v in results.items()
    }
    print(json.dumps({"msm_log2": k, "times_s": results, "scaling_efficiency": eff}))


if __name__ == "__main__":
    main()
