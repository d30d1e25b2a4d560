import random, time
import jax
import jax.numpy as jnp
from paillier_halo2_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()
from paillier_halo2_tpu.ff import field_jax as f
from paillier_halo2_tpu.ff.host import FR_MOD
from paillier_halo2_tpu.poly.ntt import ntt
from paillier_halo2_tpu.ec import host as ech
from paillier_halo2_tpu.msm.pippenger import msm
print("devices:", jax.devices(), flush=True)
rng = random.Random(3)
k, n = 5, 32
a = [rng.randrange(FR_MOD) for _ in range(n)]
b = [rng.randrange(FR_MOD) for _ in range(n)]
am = f.to_mont(f.FR, jnp.asarray(f.pack_ints(a)))
bm = f.to_mont(f.FR, jnp.asarray(f.pack_ints(b)))
t0 = time.monotonic()
prod = ntt(f.mont_mul(f.FR, ntt(am, k), ntt(bm, k)), k, inverse=True)
got = f.unpack_ints(f.from_mont(f.FR, prod))
expect = [0] * n
for i in range(n):
    for j in range(n):
        expect[(i + j) % n] = (expect[(i + j) % n] + a[i] * b[j]) % FR_MOD
assert got == expect, "cyclic convolution via NTT mismatch"
print(f"[1] NTT cyclic-convolution identity holds on TPU ({time.monotonic()-t0:.1f}s)", flush=True)
n_pts = 32
pts = [ech.g1_mul(ech.G1, rng.randrange(1, ech.R)) for _ in range(n_pts)]
scalars = [rng.randrange(ech.R) for _ in range(n_pts)]
t0 = time.monotonic()
got = msm(pts, scalars, window_bits=8)
assert got == ech.g1_msm(pts, scalars)
print(f"[2] MSM(32 pts, 8-bit windows) matches host oracle on TPU ({time.monotonic()-t0:.1f}s)", flush=True)
print("CONSUMER FLOWS OK")
