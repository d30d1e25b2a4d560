import os, random, time, sys
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8 --xla_disable_hlo_passes=fusion"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from paillier_halo2_tpu.ec import bn254, host as ech
from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.msm import pippenger as pip
rng = random.Random(5)
for n in (128, 256):
    base = ech.G1; pts = []; acc = base
    for i in range(n):
        acc = ech.g1_add(acc, base); pts.append(acc)
    px, py, pinf = (jnp.asarray(a) for a in bn254.pack_affine(pts))
    sd = jnp.asarray(f.pack_ints([rng.randrange(ech.R) for _ in range(n)]))
    t0=time.monotonic()
    keys = pip._keys_from_digits(sd, 4)
    buckets = pip._bucket_accumulate(px, py, pinf, keys, 4)
    jax.block_until_ready(buckets)
    print(f"n={n}: accumulate(compile+run)={time.monotonic()-t0:.1f}s", flush=True)
