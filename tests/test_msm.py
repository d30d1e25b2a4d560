"""MSM vs host oracle, including adversarial scalar distributions."""
import random

import pytest

from paillier_halo2_tpu.ec import host as ech
from paillier_halo2_tpu.msm.pippenger import msm as _msm


def msm(points, scalars):
    return _msm(points, scalars, window_bits=4)

RNG = random.Random(4242)


def _rand_points(n):
    return [ech.g1_mul(ech.G1, RNG.randrange(1, ech.R)) for _ in range(n)]


def test_msm_small_random():
    n = 64
    pts = _rand_points(n)
    scalars = [RNG.randrange(ech.R) for _ in range(n)]
    expect = ech.g1_msm(pts, scalars)
    assert msm(pts, scalars) == expect


def test_msm_edge_scalars():
    pts = _rand_points(8)
    scalars = [0, 1, ech.R - 1, 2, 0, 255, 256, 65537]
    expect = ech.g1_msm(pts, scalars)
    assert msm(pts, scalars) == expect


def test_msm_with_infinity_and_repeats():
    pts = _rand_points(6) + [None, None]
    # All-equal scalars: every point lands in the same bucket per window —
    # worst case for the gather-rounds loop.
    scalars = [12345678901234567890] * 8
    expect = ech.g1_msm(pts, scalars)
    assert msm(pts, scalars) == expect


def test_msm_single_and_empty_buckets():
    pts = _rand_points(1)
    scalars = [987654321]
    assert msm(pts, scalars) == ech.g1_mul(pts[0], scalars[0])


def test_msm_window8_matches():
    pts = _rand_points(16)
    scalars = [RNG.randrange(ech.R) for _ in range(16)]
    expect = ech.g1_msm(pts, scalars)
    assert _msm(pts, scalars, window_bits=8) == expect


def test_msm_strided_sub_accumulators():
    """Explicit S>1 sub-accumulator schedule (the accelerator default; CPU
    defaults to the degenerate S=1 schedule for fallback-kernel speed):
    exercises the strided gather-rounds, per-block merge fold, and row
    reordering of _bucket_accumulate against the host oracle."""
    import jax.numpy as jnp

    from paillier_halo2_tpu.ec import bn254
    from paillier_halo2_tpu.ff import field_jax as f
    from paillier_halo2_tpu.msm import pippenger as pip

    wb = 4
    pts = _rand_points(12)
    scalars = [RNG.randrange(ech.R) for _ in range(10)] + [12345, 12345]
    px, py, pinf = bn254.pack_affine(pts)
    sd = f.pack_ints([s % ech.R for s in scalars])
    keys = pip._keys_from_digits(jnp.asarray(sd), wb)
    n_windows = keys.shape[0]
    # mixed schedule: two blocks (S=2 and S=4), unsorted row order
    subs = tuple(2 if w % 2 == 0 else 4 for w in range(n_windows))
    buckets = pip._bucket_accumulate(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pinf), keys, wb, subs
    )
    tw = pip._window_sums(buckets, 1 << wb)
    wpts = bn254.unpack_jacobian(tw)
    acc = None
    for p in reversed(wpts):
        for _ in range(wb):
            acc = ech.g1_double(acc)
        acc = ech.g1_add(acc, p)
    assert acc == ech.g1_msm(pts, scalars)
