"""Multi-host mesh configs (BASELINE.json config 5): the same sharded MSM /
distributed NTT programs over a 2D (host, chip) mesh — chips combine over the
ICI axis before hosts over DCN — validated on the virtual 8-device CPU mesh
as 2 hosts x 4 chips and 4 hosts x 2 chips."""
import random

import jax.numpy as jnp
import pytest

from paillier_halo2_tpu.ec import bn254, host as ech
from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.mesh.msm import msm_sharded_multi
from paillier_halo2_tpu.mesh.sharding import make_mesh_2d

RNG = random.Random(77)


@pytest.mark.parametrize("n_hosts,cph", [(2, 4), (4, 2)])
def test_msm_2d_mesh_matches_host(n_hosts, cph):
    mesh = make_mesh_2d(n_hosts, cph)
    n = 32
    pts = [ech.g1_mul(ech.G1, RNG.randrange(1, ech.R)) for _ in range(n)]
    px, py, pinf = bn254.pack_affine(pts)
    sets = [[RNG.randrange(ech.R) for _ in range(n)] for _ in range(2)]
    sd = jnp.stack([jnp.asarray(f.pack_ints(s)) for s in sets])
    got = msm_sharded_multi(mesh, px, py, pinf, sd, window_bits=4)
    for g, scalars in zip(got, sets):
        assert g == ech.g1_msm(pts, scalars)
