"""Direct lane-for-lane tests of the Pallas TPU kernels against the XLA
digit-vector path and Python-int oracles (VERDICT round-1 item 5: the fused
kernels previously had no kernel-boundary tests).

Runs in interpret mode on CPU (bit-exact semantics, no Mosaic); the same
calls compile natively on TPU. Covers all three dot impls (int8 / bf16 /
f32), p-1 / 0 operand edges, doubling fallback, infinity lanes, annihilation,
and the packed-gather operand form.
"""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from paillier_halo2_tpu.ec import bn254
from paillier_halo2_tpu.ec import host as ech
from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.ff import host
from paillier_halo2_tpu.ff.pallas_mulmod import BLOCK, mont_mul_pallas

RNG = random.Random(90210)
R = 1 << 256


def _pack(vals, n=BLOCK):
    vals = list(vals) + [0] * (n - len(vals))
    return jnp.asarray(f.pack_ints(vals))


def _mont_oracle(a, b, p):
    return a * b * pow(R, -1, p) % p


@pytest.mark.parametrize("impl", ["conv", "int8", "bf16", "f32"])
@pytest.mark.parametrize("spec", [f.FR, f.FQ], ids=["Fr", "Fq"])
def test_mont_mul_pallas_matches_oracle(impl, spec):
    p = spec.p
    edge = [0, 1, p - 1, p - 2, (1 << 255) % p, spec.r_mod_p]
    avals = edge + [RNG.randrange(p) for _ in range(BLOCK - len(edge))]
    bvals = list(reversed(edge)) + [RNG.randrange(p) for _ in range(BLOCK - len(edge))]
    out = mont_mul_pallas(spec, _pack(avals), _pack(bvals), True, impl)
    got = f.unpack_ints(out)
    want = [_mont_oracle(a, b, p) for a, b in zip(avals, bvals)]
    assert got == want


@pytest.mark.parametrize("impl", ["conv", "int8", "bf16"])
def test_mont_mul_pallas_matches_xla_path(impl):
    """Lane-for-lane parity with the XLA mont_mul on the same digits."""
    avals = [RNG.randrange(f.FR.p) for _ in range(BLOCK)]
    bvals = [RNG.randrange(f.FR.p) for _ in range(BLOCK)]
    a, b = _pack(avals), _pack(bvals)
    got = np.asarray(mont_mul_pallas(f.FR, a, b, True, impl))
    want = np.asarray(f.mont_mul(f.FR, a, b))
    np.testing.assert_array_equal(got, want)


# -- point kernels ------------------------------------------------------------


def _rand_points(k):
    return [ech.g1_mul(ech.G1, RNG.randrange(1, ech.R)) for _ in range(k)]


def _points_case():
    """Lane layout: [generic adds..., doubling, annihilation, p_inf, q_inf,
    both_inf] padded to BLOCK with generic lanes."""
    base = _rand_points(BLOCK)
    other = _rand_points(BLOCK)
    p_list = list(base)
    q_list = list(other)
    # lane 0: doubling (P + P)
    q_list[0] = p_list[0]
    # lane 1: annihilation (P + -P)
    p1 = p_list[1]
    q_list[1] = (p1[0], (-p1[1]) % f.FQ.p)
    # lane 2: P + inf
    q_list[2] = None
    # lane 3: inf + Q
    p_list[3] = None
    # lane 4: inf + inf
    p_list[4] = None
    q_list[4] = None
    return p_list, q_list


def _expected_add(p_list, q_list):
    return [ech.g1_add(p, q) for p, q in zip(p_list, q_list)]


def _assert_points_equal(jpoint, want):
    got = bn254.unpack_jacobian(jpoint)
    assert got == want


def test_padd_pallas_full_edge_cases():
    from paillier_halo2_tpu.ec.pallas_point import padd_pallas

    p_list, q_list = _points_case()
    P = bn254.pack_jacobian(p_list)
    Q = bn254.pack_jacobian(q_list)
    out = padd_pallas(f.FQ, *P, *Q, True, False)
    _assert_points_equal(out, _expected_add(p_list, q_list))


def test_padd_pallas_nodouble_contract():
    """nodouble=True: distinct finite points add correctly; a violated
    contract (doubling / annihilation lanes) must degrade to infinity,
    never a wrong finite point."""
    from paillier_halo2_tpu.ec.pallas_point import padd_pallas

    p_list, q_list = _points_case()
    P = bn254.pack_jacobian(p_list)
    Q = bn254.pack_jacobian(q_list)
    out = padd_pallas(f.FQ, *P, *Q, True, True)
    got = bn254.unpack_jacobian(out)
    want = _expected_add(p_list, q_list)
    for lane, (g, w) in enumerate(zip(got, want)):
        if lane in (0, 1):  # contract violated -> infinity sentinel
            assert g is None
        else:
            assert g == w, f"lane {lane}"


def test_padd_mixed_pallas_edge_cases():
    from paillier_halo2_tpu.ec.pallas_point import padd_mixed_pallas

    p_list, q_list = _points_case()
    P = bn254.pack_jacobian(p_list)
    qx, qy, q_inf = bn254.pack_affine(q_list)
    out = padd_mixed_pallas(
        f.FQ, *P, jnp.asarray(qx), jnp.asarray(qy), jnp.asarray(q_inf), True, False
    )
    _assert_points_equal(out, _expected_add(p_list, q_list))


def test_padd_mixed_packed_pallas_matches_unpacked():
    """The dense-row packed form (the MSM gather currency) must agree with
    the plain mixed add lane for lane."""
    from paillier_halo2_tpu.ec.pallas_point import padd_mixed_packed_pallas

    p_list, q_list = _points_case()
    P = bn254.pack_jacobian(p_list)
    qx, qy, q_inf = bn254.pack_affine(q_list)
    packed = bn254.pack_points_dense(jnp.asarray(qx), jnp.asarray(qy))
    out = padd_mixed_packed_pallas(
        f.FQ, *P, packed, jnp.asarray(q_inf), True, False
    )
    _assert_points_equal(out, _expected_add(p_list, q_list))


def test_mont_mul_dispatch_consistency():
    """f.mont_mul must produce identical results whether or not the Pallas
    path is taken (here: both on CPU -> XLA, vs explicit interpret kernel)."""
    avals = [host.FR_MOD - 1 - i for i in range(BLOCK)]
    bvals = [pow(3, i, host.FR_MOD) for i in range(BLOCK)]
    a, b = _pack(avals), _pack(bvals)
    want = [_mont_oracle(x, y, host.FR_MOD) for x, y in zip(avals, bvals)]
    assert f.unpack_ints(f.mont_mul(f.FR, a, b)) == want
    for impl in ("conv", "int8", "bf16", "f32"):
        assert f.unpack_ints(mont_mul_pallas(f.FR, a, b, True, impl)) == want


@pytest.mark.parametrize("spec", [f.FR, f.FQ], ids=["Fr", "Fq"])
def test_mont_mul_conv_fuzz(spec):
    """Dense randomized regression for the conv body. Round-2 bug class this
    pins: with the folded m's value slightly above R (digits reach 256), the
    p-convolution's shift-1 plane emits into output row 63 — a 63-row pmat
    silently truncated it (~1/2000 random lanes wrong)."""
    p = spec.p
    rng = random.Random(777)
    bad = 0
    for _ in range(4):
        avals = [rng.randrange(p) for _ in range(BLOCK)]
        bvals = [rng.randrange(p) for _ in range(BLOCK)]
        out = mont_mul_pallas(spec, _pack(avals), _pack(bvals), True, "conv")
        got = f.unpack_ints(np.asarray(out))
        want = [_mont_oracle(a, b, p) for a, b in zip(avals, bvals)]
        bad += sum(g != w for g, w in zip(got, want))
    assert bad == 0
