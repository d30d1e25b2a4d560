"""Native C++ host engine (native/bn254.cpp) vs the pure-Python oracles.

The Python implementations in ec/host.py and ec/pairing.py are forced via
PAILLIER_TPU_NO_NATIVE-style bypass (calling the module-level fallbacks
directly), and the native engine must agree on every operation including the
edge cases (infinity, doubling, annihilation, zero scalars).
"""
import random

import pytest

from paillier_halo2_tpu import native
from paillier_halo2_tpu.ec import host as ech

pytestmark = pytest.mark.skipif(native.lib() is None, reason="no g++ / native build")

RNG = random.Random(2024)


def _py_g1_add(p, q):
    if p is None:
        return q
    if q is None:
        return p
    x1, y1 = p
    x2, y2 = q
    Q = ech.Q
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, -1, Q) % Q
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    y3 = (lam * (x1 - x3) - y1) % Q
    return (x3, y3)


def _py_g1_mul(p, k):
    acc = None
    k %= ech.R
    while k:
        if k & 1:
            acc = _py_g1_add(acc, p)
        p = _py_g1_add(p, p)
        k >>= 1
    return acc


def test_native_g1_matches_python():
    for _ in range(10):
        a = _py_g1_mul(ech.G1, RNG.randrange(1, ech.R))
        b = _py_g1_mul(ech.G1, RNG.randrange(1, ech.R))
        assert native.g1_add(a, b) == _py_g1_add(a, b)
        k = RNG.randrange(ech.R)
        assert native.g1_mul(a, k) == _py_g1_mul(a, k)
    # edge cases
    assert native.g1_add(None, a) == a
    assert native.g1_add(a, None) == a
    assert native.g1_add(a, a) == _py_g1_add(a, a)
    assert native.g1_add(a, (a[0], (ech.Q - a[1]) % ech.Q)) is None
    assert native.g1_mul(a, 0) is None


def test_native_msm_matches_python():
    n = 23
    pts = [_py_g1_mul(ech.G1, RNG.randrange(1, ech.R)) for _ in range(n)]
    pts[3] = None
    scal = [RNG.randrange(ech.R) for _ in range(n)]
    scal[5] = 0
    exp = None
    for p, s in zip(pts, scal):
        exp = _py_g1_add(exp, _py_g1_mul(p, s))
    assert native.g1_msm(pts, scal) == exp


def test_native_pairing_bilinearity():
    a = RNG.randrange(2, 1 << 20)
    aP = _py_g1_mul(ech.G1, a)
    aQ = ech.g2_mul(ech.G2, a)
    assert native.pairing_check([(aP, ech.G2), (ech.g1_neg(ech.G1), aQ)])
    assert not native.pairing_check([(aP, ech.G2), (ech.G1, aQ)])
    # infinity pairs contribute the identity
    assert native.pairing_check([(None, ech.G2), (ech.G1, None)])
