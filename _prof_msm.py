import os, random, time
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from paillier_halo2_tpu.utils.cache import setup_compilation_cache
pass
import jax.numpy as jnp
from paillier_halo2_tpu.ec import bn254, host as ech
from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.msm import pippenger as pip
rng = random.Random(5)
n = 1024
print("building points...", flush=True)
t0=time.monotonic()
# build points quickly: random multiples via doubling chain
base = ech.G1; pts = []
acc = base
for i in range(n):
    acc = ech.g1_add(acc, base)
    pts.append(acc)
print("host points", time.monotonic()-t0, flush=True)
px, py, pinf = bn254.pack_affine(pts)
scalars = [rng.randrange(ech.R) for _ in range(n)]
sd = jnp.asarray(f.pack_ints(scalars))
px, py, pinf = jnp.asarray(px), jnp.asarray(py), jnp.asarray(pinf)
for wb in (4, 4, 8, 8):
    t0=time.monotonic()
    keys = pip._keys_from_digits(sd, wb)
    buckets = pip._bucket_accumulate(px, py, pinf, keys, wb)
    jax.block_until_ready(buckets)
    t1=time.monotonic()
    tw = pip._window_sums(buckets, 1 << wb)
    jax.block_until_ready(tw)
    t2=time.monotonic()
    pts_out = bn254.unpack_jacobian(tw)
    t3=time.monotonic()
    print(f"wb={wb}: accumulate={t1-t0:.1f}s window_sums={t2-t1:.1f}s unpack={t3-t2:.1f}s", flush=True)
