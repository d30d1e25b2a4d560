import os, random, time
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8 --xla_disable_hlo_passes=fusion"
import jax
jax.config.update("jax_platforms", "cpu")
from paillier_halo2_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()
import jax.numpy as jnp
from paillier_halo2_tpu.ec import bn254, host as ech
from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.msm import pippenger as pip
rng = random.Random(5)
n = 1024
base = ech.G1; pts = []; acc = base
for i in range(n):
    acc = ech.g1_add(acc, base); pts.append(acc)
px, py, pinf = (jnp.asarray(a) for a in bn254.pack_affine(pts))
scalars = [rng.randrange(ech.R) for _ in range(n)]
sd = jnp.asarray(f.pack_ints(scalars))
for wb in (4, 4, 8):
    t0=time.monotonic()
    got = pip.msm_packed(px, py, pinf, sd, wb)
    t1=time.monotonic()
    print(f"wb={wb}: full msm {t1-t0:.1f}s", flush=True)
expect = ech.g1_msm(pts, scalars)
print("correct:", got == expect, flush=True)
