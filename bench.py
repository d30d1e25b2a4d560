"""Round benchmark — run by the driver on real TPU hardware.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Covers the three BASELINE.md metrics (the reference publishes no numbers —
BASELINE.md; its bench tests only println! timings, /root/reference/src/
bench.rs:173-178):
- Pippenger MSM throughput per chip at 2^20 points (the dominant prover
  kernel), VALIDATED against a host-oracle expected value (fixture committed
  in params_fixtures/ — bases and scalars are deterministic);
- speed-of-light mulmod throughput (north-star per-chip metric) with a
  %-of-ceiling figure (ceiling = measured HBM bandwidth / 384 B per lane);
- proofs/sec on the reference bench geometry (ENC=128/LIMB=64, k=14,
  lookup 13 — /root/reference/src/bench.rs:161-179), full keygen + KZG
  prove + verify.

Robustness (round-2 died rc=124 with no JSON; round-4 died to the driver's
EXTERNAL kill mid-proof-compile, which SIGALRM cannot interrupt while the
interpreter is blocked inside a native XLA compile call): every phase runs
under a SIGALRM deadline carved out of one global budget (BENCH_BUDGET_S,
default 900 s — deliberately under the driver window), AND a provisional
JSON line is printed after EVERY completed phase. The driver parses the
LAST JSON line on stdout, so a kill at any point still yields the metrics
measured so far instead of parsed=null.

The proof phase is cache-first: a proving key saved by an earlier healthy
run is loaded when its structural fingerprint matches the freshly
synthesized circuit (plonk/serialize.table_fingerprint — ADVICE r4), so
keygen never eats the proof budget. BENCH_FORCE_KEYGEN=1 forces fresh.

vs_baseline compares MSM points/s to the previous round's recorded value
(scaled by size when the previous round measured 2^17).
"""
import contextlib
import glob
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))


def log(msg):
    print(f"[{time.monotonic()-T_START:6.1f}s] {msg}", file=sys.stderr, flush=True)


def remaining() -> float:
    return BUDGET_S - (time.monotonic() - T_START)


class PhaseTimeout(Exception):
    pass


@contextlib.contextmanager
def deadline(seconds: float, label: str):
    """SIGALRM-based phase guard: raises PhaseTimeout in the main thread if
    the phase overruns. The timer REPEATS every 15 s after first firing:
    library code (e.g. jax's compilation-cache reader) can catch-and-warn an
    exception raised mid-call — observed eating the first alarm — so keep
    firing until one propagates. Margin of 30 s is always held back for the
    final JSON print."""
    seconds = min(seconds, remaining() - 30)
    if seconds <= 0:
        raise PhaseTimeout(f"{label}: no budget left")

    def handler(signum, frame):
        raise PhaseTimeout(label)

    old = signal.signal(signal.SIGALRM, handler)
    signal.setitimer(signal.ITIMER_REAL, seconds, 15.0)
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


def main():
    from paillier_halo2_tpu.utils.cache import setup_compilation_cache
    from paillier_halo2_tpu.utils.sysfix import raise_map_count

    raise_map_count()
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    log(f"devices: {jax.devices()}")

    from paillier_halo2_tpu.ff import field_jax as f
    from paillier_halo2_tpu.ff.pallas_mulmod import mont_mul_pallas

    on_tpu = jax.devices()[0].platform != "cpu"
    extras = {}
    msm_points_per_s = 0.0

    def vs_baseline() -> float:
        vs = 1.0
        prev = sorted(
            glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json"))
        )
        for pth in reversed(prev):
            try:
                with open(pth) as fh:
                    last = json.load(fh)
                pv = last.get("parsed") or {}
                if (
                    pv.get("unit") == "points/s/chip"
                    and pv.get("value")
                    and msm_points_per_s
                ):
                    vs = msm_points_per_s / float(pv["value"])
                    break
            except Exception:
                continue
        return vs

    def emit(phase_done: str) -> None:
        """Print the full JSON line with everything measured so far. Called
        after every phase: the driver parses the LAST line on stdout, so an
        external kill mid-phase still leaves a complete provisional result."""
        extras["last_phase_done"] = phase_done
        print(
            json.dumps(
                {
                    "metric": "msm_points_per_s_2^20",
                    "value": round(msm_points_per_s, 1),
                    "unit": "points/s/chip",
                    "vs_baseline": round(vs_baseline(), 3),
                    **extras,
                }
            ),
            flush=True,
        )

    # sync via a tiny d2h readback: over the axon tunnel block_until_ready
    # can return before compute finishes, inflating throughput ~100x
    sync = lambda x: np.asarray(x[0, :1])

    # A valid JSON line exists from second zero: even a hard stall inside the
    # FIRST phase (axon compile-service hang — native call, SIGALRM cannot
    # interrupt it) leaves the driver a parseable (if empty) result.
    emit("start")

    # Live HBM streaming bandwidth (VERDICT r4 #6: decide whether the tunnel
    # or the kernel owns the mulmod ceiling). A pure read+write copy is the
    # roofline denominator, measured in THIS session rather than the round-3
    # constant — axon service health moves it between windows. Own (small)
    # deadline: a compile-service stall here must only lose this number.
    bw_meas = 159.0
    try:
        with deadline(120, "hbm_bw"):
            nb = 64 * (1 << 20)  # 256 MB as uint32
            xbw = jnp.arange(nb, dtype=jnp.uint32)
            cp = jax.jit(lambda v: v + 1)
            rbw = cp(xbw)
            np.asarray(rbw[:1])
            t0 = time.monotonic()
            reps_bw = 5
            for _ in range(reps_bw):
                rbw = cp(rbw)
            np.asarray(rbw[:1])
            bw_meas = 2 * nb * 4 * reps_bw / (time.monotonic() - t0) / 1e9
            extras["hbm_copy_gbps_measured"] = round(bw_meas, 1)
            log(f"hbm copy bandwidth: {bw_meas:.1f} GB/s (read+write)")
            del xbw, rbw
    except PhaseTimeout as e:
        log(f"** phase timed out: {e}")
        extras["hbm_bw_timeout"] = True

    # ---- speed-of-light mulmod (Pallas on TPU, XLA elsewhere) -------------
    try:
        with deadline(300, "mulmod"):
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

            r = mm(a, b)
            sync(r)
            t0 = time.monotonic()
            reps = 10
            for _ in range(reps):
                r = mm(r, b)
            sync(r)
            mulmod_per_s = N * reps / (time.monotonic() - t0)
            # HBM-bound ceiling: 3 x (32 digits x 4 B) per lane. TWO
            # denominators reported (VERDICT r3 weak #3 — one alone
            # flatters): the MEASURED device bandwidth over the axon tunnel
            # (~159 GB/s on pure-copy) and the v5e SPEC bandwidth
            # (819 GB/s) — the honest speed-of-light figure.
            env_bw = os.environ.get("BENCH_HBM_GBPS")
            hbm_gbps = float(env_bw) if env_bw else bw_meas
            spec_gbps = float(os.environ.get("BENCH_HBM_SPEC_GBPS", "819"))
            ceiling = hbm_gbps * 1e9 / 384.0
            ceiling_spec = spec_gbps * 1e9 / 384.0
            extras["mulmod_per_s"] = round(mulmod_per_s, 1)
            extras["mulmod_gbps_effective"] = round(mulmod_per_s * 384.0 / 1e9, 1)
            extras["mulmod_pct_of_hbm_ceiling"] = round(100 * mulmod_per_s / ceiling, 1)
            extras["mulmod_pct_of_spec_bw"] = round(100 * mulmod_per_s / ceiling_spec, 1)
            log(
                f"mulmod throughput: {mulmod_per_s/1e6:.1f} M/s "
                f"({extras['mulmod_pct_of_hbm_ceiling']}% of measured-BW ceiling, "
                f"{extras['mulmod_pct_of_spec_bw']}% of v5e spec-BW)"
            )

    except PhaseTimeout as e:
        log(f"** phase timed out: {e}")
        extras["mulmod_timeout"] = True
    emit("mulmod")

    # lazy-representation mulmod (int16 digit I/O — the format the fused
    # point kernels actually run; ff/lazy_mont.py): 192 B/lane instead of
    # 384. Own deadline so a compile stall here never costs other metrics.
    if on_tpu:
        try:
            with deadline(240, "mulmod_lazy"):
                from paillier_halo2_tpu.ff.lazy_mont import mont_mul_lazy_pallas

                N = 1 << 20
                rng = np.random.default_rng(1)
                al = jnp.asarray(rng.integers(0, 255, (32, N)).astype(np.int16))
                bl = jnp.asarray(rng.integers(0, 255, (32, N)).astype(np.int16))
                r = mont_mul_lazy_pallas(f.FR, al, bl)
                sync(r)
                t0 = time.monotonic()
                reps = 10
                for _ in range(reps):
                    r = mont_mul_lazy_pallas(f.FR, r, bl)
                sync(r)
                lazy_per_s = N * reps / (time.monotonic() - t0)
                env_bw = os.environ.get("BENCH_HBM_GBPS")
                hbm_gbps = float(env_bw) if env_bw else extras.get(
                    "hbm_copy_gbps_measured", 159.0
                )
                spec_gbps = float(os.environ.get("BENCH_HBM_SPEC_GBPS", "819"))
                lc = hbm_gbps * 1e9 / 192.0
                lc_spec = spec_gbps * 1e9 / 192.0
                extras["mulmod_lazy_per_s"] = round(lazy_per_s, 1)
                extras["mulmod_lazy_gbps_effective"] = round(
                    lazy_per_s * 192.0 / 1e9, 1
                )
                extras["mulmod_lazy_pct_of_hbm_ceiling"] = round(
                    100 * lazy_per_s / lc, 1
                )
                extras["mulmod_lazy_pct_of_spec_bw"] = round(
                    100 * lazy_per_s / lc_spec, 1
                )
                log(
                    f"lazy mulmod (int16): {lazy_per_s/1e6:.1f} M/s "
                    f"({extras['mulmod_lazy_pct_of_hbm_ceiling']}% of measured "
                    f"ceiling, {extras['mulmod_lazy_pct_of_spec_bw']}% of spec-BW)"
                )
        except PhaseTimeout as e:
            log(f"** phase timed out: {e}")
            extras["mulmod_lazy_timeout"] = True
        emit("mulmod_lazy")

    # ---- MSM throughput at 2^20 (validated) -------------------------------
    try:
        with deadline(600, "msm"):
            from paillier_halo2_tpu.ec import host as ech
            from paillier_halo2_tpu.msm.pippenger import msm_packed
            from paillier_halo2_tpu.plonk.srs import read_or_create_srs

            k_msm = int(os.environ.get("BENCH_MSM_LOG2", "20"))
            n_pts = 1 << k_msm
            t0 = time.monotonic()
            srs = read_or_create_srs(k_msm)
            log(f"srs k={k_msm} ready in {time.monotonic()-t0:.1f}s")
            px, py, pinf = srs.g1_px, srs.g1_py, srs.g1_inf
            rng = np.random.default_rng(1)
            hi = rng.integers(0, 2**63, (4, n_pts), dtype=np.int64)
            scalars = [
                (int(x) | int(y) << 63 | int(z) << 126 | int(w) << 189) % ech.R
                for x, y, z, w in zip(*hi)
            ]
            sd = f.pack_ints(scalars)
            pxd, pyd, pinfd, sdd = (jnp.asarray(x) for x in (px, py, pinf, sd))
            np.asarray(pxd[0, :1])  # force h2d before timing
            t0 = time.monotonic()
            out = msm_packed(pxd, pyd, pinfd, sdd)
            t_first = time.monotonic() - t0
            t0 = time.monotonic()
            out = msm_packed(pxd, pyd, pinfd, sdd)
            t_msm = time.monotonic() - t0
            msm_points_per_s = n_pts / t_msm
            log(
                f"msm 2^{k_msm}: first={t_first:.1f}s warm={t_msm:.2f}s "
                f"-> {msm_points_per_s/1e3:.1f} k pts/s"
            )

            # validate against the host oracle (native C++ MSM). The expected
            # value is a committed fixture (params_fixtures/): SRS bases are
            # dev-deterministic and the scalar stream is seeded, so the value
            # is machine-independent. Fall back to computing it once.
            exp_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "params_fixtures",
                f"bench_msm_expected_{k_msm}.json",
            )
            expected = None
            if os.path.exists(exp_path):
                with open(exp_path) as fh:
                    ex, ey = json.load(fh)
                    expected = (int(ex, 16), int(ey, 16)) if ex else None
            else:
                log("computing host-oracle MSM expectation (one-time)...")
                xs = f.unpack_ints(np.asarray(f.from_mont(f.FQ, jnp.asarray(px))))
                ys = f.unpack_ints(np.asarray(f.from_mont(f.FQ, jnp.asarray(py))))
                inf = np.asarray(pinf)
                pts = [None if inf[i] else (xs[i], ys[i]) for i in range(n_pts)]
                t0 = time.monotonic()
                expected = ech.g1_msm(pts, scalars)
                log(f"host oracle took {time.monotonic()-t0:.1f}s")
                os.makedirs(os.path.dirname(exp_path), exist_ok=True)
                with open(exp_path, "w") as fh:
                    json.dump(
                        ["%x" % expected[0], "%x" % expected[1]] if expected else ["", ""],
                        fh,
                    )
            msm_valid = out == expected
            extras["msm_valid"] = bool(msm_valid)
            extras["msm_warm_s"] = round(t_msm, 3)
            if not msm_valid:
                log(f"** MSM VALIDATION FAILED: got {out} want {expected}")
    except PhaseTimeout as e:
        log(f"** phase timed out: {e}")
        extras["msm_timeout"] = True
    emit("msm")

    # ---- proofs/sec on the reference bench geometry -----------------------
    # ENC=128/LIMB=64, k=14, lookup 13: /root/reference/src/bench.rs:161-179
    if os.environ.get("BENCH_SKIP_PROOF") != "1":
        try:
            with deadline(remaining() - 60, "proof"):
                import random

                from paillier_halo2_tpu.bignum.host import paillier_enc_native
                from paillier_halo2_tpu.gadgets.context import Context
                from paillier_halo2_tpu.gadgets.range import RangeChip
                from paillier_halo2_tpu.harness import (
                    PaillierEncryptionInput,
                    paillier_enc_test,
                )
                from paillier_halo2_tpu.plonk.keygen import keygen
                from paillier_halo2_tpu.plonk.prover import create_proof
                from paillier_halo2_tpu.plonk.srs import read_or_create_srs
                from paillier_halo2_tpu.plonk.verifier import verify_proof

                K = int(os.environ.get("BENCH_PROOF_K", "14"))
                LK, ENC, LIMB = K - 1, 128, 64
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
                log(f"proof circuit: {table.n_rows} rows, k={K}")
                srs_p = read_or_create_srs(K)
                # Cache-first keygen: the bench circuit is seed-deterministic,
                # so a pk saved by an earlier healthy run is byte-equivalent —
                # IF its structural fingerprint matches the freshly
                # synthesized table (ADVICE r4: filename-only keying silently
                # loads stale keys across layout changes). The axon service's
                # keygen latency varies 151 s -> 888 s across windows (round-4
                # HEAVY_RUNS), so never spend the proof budget on keygen when
                # a verified cache exists.
                from paillier_halo2_tpu.plonk.serialize import (
                    load_proving_key,
                    save_proving_key,
                    table_fingerprint,
                )

                table_fp = table_fingerprint(table, K, LK)
                pk_cache = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "params",
                    f"pk_bench_k{K}_enc{ENC}.npz",
                )
                pk, t_keygen = None, None
                if (
                    os.path.exists(pk_cache)
                    and os.environ.get("BENCH_FORCE_KEYGEN") != "1"
                ):
                    try:
                        pk = load_proving_key(pk_cache, srs_p, expect_table_fp=table_fp)
                        extras["keygen_cached"] = True
                        log(f"loaded cached pk (fingerprint {table_fp})")
                    except Exception as e:
                        log(f"pk cache unusable ({e}); fresh keygen")
                if pk is None:
                    kg_budget = min(700.0, max(120.0, remaining() * 0.5))
                    try:
                        with deadline(kg_budget, "keygen"):
                            t0 = time.monotonic()
                            pk = keygen(table, K, LK, srs_p)
                            t_keygen = time.monotonic() - t0
                        try:
                            save_proving_key(pk, pk_cache, table_fp=table_fp)
                        except Exception as e:
                            log(f"pk cache save failed: {e}")
                    except PhaseTimeout:
                        log("** keygen timed out")
                        extras["keygen_timeout"] = True
                if pk is None:
                    raise PhaseTimeout("keygen (no cached pk)")
                emit("keygen")
                t0 = time.monotonic()
                proof = create_proof(pk, table)
                t_cold = time.monotonic() - t0
                log(f"cold proof: {t_cold:.1f}s")
                extras["proof_cold_s"] = round(t_cold, 2)
                extras["keygen_s"] = (
                    round(t_keygen, 2) if t_keygen is not None else None
                )
                emit("proof_cold")
                from paillier_halo2_tpu.poly import ops as _ops

                _ops.reset_transfer_counts()
                t0 = time.monotonic()
                proof = create_proof(pk, table)
                t_proof = time.monotonic() - t0
                # Transfer-count semantics (ADVICE r3): these count the
                # prover's mont-pack transfers through to_device_mont /
                # from_device_mont. Only d2h readbacks are true blocking
                # syncs; h2d are enqueues. Reported separately plus the
                # legacy combined figure.
                extras["h2d_per_proof"] = _ops.TRANSFER_COUNTS["h2d"]
                extras["d2h_per_proof"] = _ops.TRANSFER_COUNTS["d2h"]
                extras["host_syncs_per_proof"] = (
                    _ops.TRANSFER_COUNTS["h2d"] + _ops.TRANSFER_COUNTS["d2h"]
                )
                t0 = time.monotonic()
                ok = verify_proof(pk.vk, srs_p, proof)
                t_verify = time.monotonic() - t0
                extras.update(
                    proof_verified=bool(ok),
                    keygen_s=round(t_keygen, 2) if t_keygen is not None else None,
                    proof_cold_s=round(t_cold, 2),
                    proof_s=round(t_proof, 2),
                    verify_s=round(t_verify, 3),
                    proof_bytes=len(proof),
                    proofs_per_sec=round(1.0 / t_proof, 4),
                    proof_k=K,
                    proof_enc_bits=ENC,
                )
                kg_str = f"{t_keygen:.1f}s" if t_keygen is not None else "cached"
                log(
                    f"k={K} enc128 proof: keygen={kg_str} cold={t_cold:.1f}s "
                    f"warm={t_proof:.1f}s verify={t_verify:.2f}s ok={ok} "
                    f"-> {1.0/t_proof:.4f} proofs/s"
                )
        except PhaseTimeout as e:
            log(f"** phase timed out: {e}")
            extras["proof_timeout"] = True

    # ---- CPU proxy ratio (reference-class same-machine baseline) ----------
    # bench_cpu_proxy.py runs the identical k=14 pipeline on CPU with the
    # native C++ NTT/MSM backend and records its numbers; surface the
    # TPU/CPU warm-proof ratio when both measurements exist.
    try:
        proxy_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "params_fixtures",
            f"cpu_proxy_k{os.environ.get('BENCH_PROOF_K', '14')}.json",
        )
        if os.path.exists(proxy_path) and extras.get("proof_s"):
            with open(proxy_path) as fh:
                proxy = json.load(fh)
            extras["cpu_proxy_proof_s"] = proxy.get("proof_s")
            extras["cpu_proxy_cpus"] = proxy.get("cpus")
            if proxy.get("proof_s"):
                extras["tpu_speedup_vs_cpu_proxy"] = round(
                    float(proxy["proof_s"]) / float(extras["proof_s"]), 2
                )
    except Exception:
        pass

    emit("final")


if __name__ == "__main__":
    main()
