"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md section 4: same tests under 1-chip and 8-chip meshes)."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paillier_halo2_tpu.ec import bn254, host as ech
from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.ff.host import FR_MOD
from paillier_halo2_tpu.mesh.msm import msm_sharded
from paillier_halo2_tpu.mesh.ntt import ntt_distributed, reorder_output
from paillier_halo2_tpu.mesh.sharding import make_mesh
from paillier_halo2_tpu.poly.ntt import ntt

RNG = random.Random(55)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_ntt_matches_single():
    mesh = make_mesh(8)
    k = 9
    n = 1 << k
    vals = [RNG.randrange(FR_MOD) for _ in range(n)]
    x = f.to_mont(f.FR, jnp.asarray(f.pack_ints(vals)))
    single = ntt(x, k)
    dist = reorder_output(ntt_distributed(mesh, x, k))
    assert f.unpack_ints(dist) == f.unpack_ints(single)


def test_distributed_ntt_2dev():
    mesh = make_mesh(2)
    k = 6
    vals = [RNG.randrange(FR_MOD) for _ in range(1 << k)]
    x = f.to_mont(f.FR, jnp.asarray(f.pack_ints(vals)))
    assert f.unpack_ints(reorder_output(ntt_distributed(mesh, x, k))) == f.unpack_ints(
        ntt(x, k)
    )


def test_sharded_msm_matches_host():
    mesh = make_mesh(8)
    n = 32
    pts = [ech.g1_mul(ech.G1, RNG.randrange(1, ech.R)) for _ in range(n)]
    scalars = [RNG.randrange(ech.R) for _ in range(n)]
    px, py, pinf = bn254.pack_affine(pts)
    sd = f.pack_ints([s % ech.R for s in scalars])
    got = msm_sharded(mesh, px, py, pinf, sd, window_bits=4)
    assert got == ech.g1_msm(pts, scalars)


def test_sharded_msm_signed_lazy_path(monkeypatch):
    """The signed/lazy sharded-MSM branch (mesh/msm.py — the path real TPU
    meshes take) validated on the CPU virtual mesh: PAILLIER_TPU_LAZY=1
    routes the bucket loop through the lazy point kernels in Pallas
    interpret mode, and PAILLIER_TPU_MSM_SIGNED forces signed windows
    (ADVICE r4 medium: this commitment-path branch otherwise only executes
    on real multi-chip hardware, which CI never has)."""
    monkeypatch.setenv("PAILLIER_TPU_LAZY", "1")
    monkeypatch.setenv("PAILLIER_TPU_MSM_SIGNED", "4")
    mesh = make_mesh(4)
    n = 16
    rng = random.Random(77)
    pts = [ech.g1_mul(ech.G1, rng.randrange(1, ech.R)) for _ in range(n)]
    scalars = [rng.randrange(ech.R) for _ in range(n)]
    px, py, pinf = bn254.pack_affine(pts)
    sd = f.pack_ints([s % ech.R for s in scalars])
    got = msm_sharded(mesh, px, py, pinf, sd)
    assert got == ech.g1_msm(pts, scalars)
