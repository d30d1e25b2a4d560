"""NTT and G1 device ops vs host oracles."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from paillier_halo2_tpu.ec import bn254, host as ech
from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.ff.host import FR_MOD
from paillier_halo2_tpu.poly.ntt import ntt, ntt_host

RNG = random.Random(99)


def test_ntt_host_roundtrip_and_convolution():
    k = 4
    n = 1 << k
    a = [RNG.randrange(FR_MOD) for _ in range(n)]
    ev = ntt_host(a, k)
    back = ntt_host(ev, k, inverse=True)
    assert back == a
    # NTT is evaluation at omega^i: check directly for a few points.
    from paillier_halo2_tpu.ff.host import root_of_unity

    w = root_of_unity(k)
    for i in [0, 1, 7]:
        x = pow(w, i, FR_MOD)
        val = sum(c * pow(x, j, FR_MOD) for j, c in enumerate(a)) % FR_MOD
        assert ev[i] == val


@pytest.mark.parametrize("k", [3, 8])
def test_ntt_device_matches_host(k):
    n = 1 << k
    a = [RNG.randrange(FR_MOD) for _ in range(n)]
    spec = f.FR
    am = f.to_mont(spec, jnp.asarray(f.pack_ints(a)))
    ev = f.unpack_ints(f.from_mont(spec, ntt(am, k)))
    assert ev == ntt_host(a, k)
    back = f.unpack_ints(f.from_mont(spec, ntt(ntt(am, k), k, inverse=True)))
    assert back == a


def test_g1_host_ops():
    G = ech.G1
    assert ech.g1_is_on_curve(G)
    assert ech.g1_is_on_curve(ech.g1_mul(G, 12345))
    # group law sanity: (a+b)G == aG + bG
    a, b = 777, 88888
    assert ech.g1_add(ech.g1_mul(G, a), ech.g1_mul(G, b)) == ech.g1_mul(G, a + b)
    # order: r*G == infinity
    assert ech.g1_mul(G, ech.R) is None


def test_g2_host_ops():
    assert ech.g2_is_on_curve(ech.G2)
    assert ech.g2_is_on_curve(ech.g2_mul(ech.G2, 987654321))
    assert ech.g2_mul(ech.G2, ech.R) is None


def test_device_point_add_double_vs_host():
    G = ech.G1
    scalars = [1, 2, 3, 5, 1000, 123456789]
    pts = [ech.g1_mul(G, s) for s in scalars]
    P = bn254.pack_jacobian(pts)
    # doubling
    got = bn254.unpack_jacobian(bn254.pdouble(P))
    assert got == [ech.g1_mul(G, 2 * s) for s in scalars]
    # pairwise addition with a shifted copy
    pts2 = [ech.g1_mul(G, 10 + s) for s in scalars]
    Q = bn254.pack_jacobian(pts2)
    got = bn254.unpack_jacobian(bn254.padd(P, Q))
    assert got == [ech.g1_mul(G, 10 + 2 * s) for s in scalars]


def test_device_point_edge_cases():
    G = ech.G1
    pts_p = [ech.g1_mul(G, 5), None, ech.g1_mul(G, 7), ech.g1_mul(G, 9), None]
    pts_q = [ech.g1_mul(G, 5), ech.g1_mul(G, 3), None, ech.g1_neg(ech.g1_mul(G, 9)), None]
    expect = [ech.g1_add(p, q) for p, q in zip(pts_p, pts_q)]
    got = bn254.unpack_jacobian(bn254.padd(bn254.pack_jacobian(pts_p), bn254.pack_jacobian(pts_q)))
    assert got == expect  # P+P, inf+Q, P+inf, P+(-P), inf+inf


def test_device_mixed_add():
    G = ech.G1
    pts_p = [ech.g1_mul(G, 4), None, ech.g1_mul(G, 6), ech.g1_mul(G, 8)]
    pts_q = [ech.g1_mul(G, 11), ech.g1_mul(G, 2), None, ech.g1_mul(G, 8)]
    expect = [ech.g1_add(p, q) for p, q in zip(pts_p, pts_q)]
    xm, ym, inf = bn254.pack_affine(pts_q)
    got = bn254.unpack_jacobian(
        bn254.padd_mixed(
            bn254.pack_jacobian(pts_p), (jnp.asarray(xm), jnp.asarray(ym)), jnp.asarray(inf)
        )
    )
    assert got == expect


def test_synthetic_divide_matches_host_recurrence():
    """Regression: associative_scan(reverse=True) mirrors the operand order of
    a non-commutative combine; synthetic_divide must still produce
    q_i = c_{i+1} + z*q_{i+1} (the (f(X)-f(z))/(X-z) quotient)."""
    import random

    from paillier_halo2_tpu.ff.host import FR_MOD as P
    from paillier_halo2_tpu.poly import ops

    rng = random.Random(5150)
    n = 16
    coeffs = [rng.randrange(P) for _ in range(n)]
    z = rng.randrange(P)
    got = ops.from_device_mont(ops.synthetic_divide(ops.to_device_mont(coeffs), z))
    exp = [0] * n
    for i in range(n - 2, -1, -1):
        exp[i] = (coeffs[i + 1] + z * exp[i + 1]) % P
    assert got == exp
    # and the division identity (f(x) - f(z)) == (x - z) * q(x) at a point
    x = rng.randrange(P)
    fx = sum(c * pow(x, i, P) for i, c in enumerate(coeffs)) % P
    fz = sum(c * pow(z, i, P) for i, c in enumerate(coeffs)) % P
    qx = sum(c * pow(x, i, P) for i, c in enumerate(exp)) % P
    assert (fx - fz) % P == (x - z) * qx % P
