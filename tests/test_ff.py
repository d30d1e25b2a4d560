"""Property tests: device field arithmetic vs Python-int oracle.

Mirrors the reference's oracle pattern (SURVEY.md section 4): every device op is
checked against host bignum math on randomized inputs, including edge values.
"""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.ff import host
from paillier_halo2_tpu.ff.limbs import digits_to_int, int_to_digits

RNG = random.Random(1234)


def rand_elems(spec, n, include_edges=True):
    xs = [RNG.randrange(spec.p) for _ in range(n)]
    if include_edges:
        xs[:4] = [0, 1, spec.p - 1, spec.p - 2][: min(4, n)]
    return xs


@pytest.mark.parametrize("spec", [f.FR, f.FQ], ids=["Fr", "Fq"])
def test_pack_roundtrip(spec):
    xs = rand_elems(spec, 16)
    arr = f.pack_ints(xs)
    assert arr.shape == (32, 16)
    assert f.unpack_ints(arr) == xs


def test_carry_normalize_adversarial():
    # Long 0xFF chains + big redundant digits: exercises full carry propagation.
    vals = np.zeros((64, 3), dtype=np.uint32)
    vals[:, 0] = 255          # all-255 chain
    vals[0, 1] = (1 << 22) - 1  # one huge digit
    vals[:32, 2] = 0x1FFFFF     # many large digits
    expect = [digits_to_int(vals[:, j]) % (1 << 512) for j in range(3)]
    out = f.carry_normalize(jnp.asarray(vals), max_digit=(1 << 22) - 1)
    got = [digits_to_int(np.asarray(out)[:, j]) for j in range(3)]
    assert got == expect
    assert np.all(np.asarray(out) < 256)


@pytest.mark.parametrize("spec", [f.FR, f.FQ], ids=["Fr", "Fq"])
def test_add_sub_neg(spec):
    xs = rand_elems(spec, 64)
    ys = rand_elems(spec, 64)
    a, b = jnp.asarray(f.pack_ints(xs)), jnp.asarray(f.pack_ints(ys))
    got_add = f.unpack_ints(f.add(spec, a, b))
    got_sub = f.unpack_ints(f.sub(spec, a, b))
    got_neg = f.unpack_ints(f.neg(spec, a))
    for x, y, ga, gs, gn in zip(xs, ys, got_add, got_sub, got_neg):
        assert ga == (x + y) % spec.p
        assert gs == (x - y) % spec.p
        assert gn == (-x) % spec.p


@pytest.mark.parametrize("spec", [f.FR, f.FQ], ids=["Fr", "Fq"])
def test_mont_mul_roundtrip(spec):
    xs = rand_elems(spec, 64)
    ys = rand_elems(spec, 64)
    a = f.to_mont(spec, jnp.asarray(f.pack_ints(xs)))
    b = f.to_mont(spec, jnp.asarray(f.pack_ints(ys)))
    prod = f.from_mont(spec, f.mont_mul(spec, a, b))
    got = f.unpack_ints(prod)
    for x, y, g in zip(xs, ys, got):
        assert g == x * y % spec.p
    # Round-trip to/from Montgomery is identity.
    assert f.unpack_ints(f.from_mont(spec, a)) == xs


def test_mont_pow_and_inv():
    spec = f.FR
    xs = rand_elems(spec, 16)
    xs[0] = 1  # avoid inverting 0
    a = f.to_mont(spec, jnp.asarray(f.pack_ints(xs)))
    e = 0xDEADBEEF12345
    got = f.unpack_ints(f.from_mont(spec, f.mont_pow_fixed(spec, a, e)))
    for x, g in zip(xs, got):
        assert g == pow(x, e, spec.p)
    inv = f.unpack_ints(f.from_mont(spec, f.mont_inv(spec, a)))
    for x, g in zip(xs, inv):
        if x != 0:
            assert x * g % spec.p == 1


def test_ge_digits():
    spec = f.FR
    xs = rand_elems(spec, 32)
    ys = list(xs)
    RNG.shuffle(ys)
    ys[0] = xs[0]  # equal case
    a, b = jnp.asarray(f.pack_ints(xs)), jnp.asarray(f.pack_ints(ys))
    got = np.asarray(f.ge_digits(a, b))
    for x, y, g in zip(xs, ys, got):
        assert bool(g) == (x >= y)


def test_root_of_unity():
    w = host.root_of_unity(4)
    assert pow(w, 16, host.FR_MOD) == 1
    assert pow(w, 8, host.FR_MOD) != 1


def test_jit_and_vmap_compatibility():
    spec = f.FR
    xs = rand_elems(spec, 8)
    ys = rand_elems(spec, 8)
    a = f.to_mont(spec, jnp.asarray(f.pack_ints(xs)))
    b = f.to_mont(spec, jnp.asarray(f.pack_ints(ys)))
    mul_jit = jax.jit(lambda u, v: f.from_mont(spec, f.mont_mul(spec, u, v)))
    got = f.unpack_ints(mul_jit(a, b))
    for x, y, g in zip(xs, ys, got):
        assert g == x * y % spec.p
