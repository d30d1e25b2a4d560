import os, random, time
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8 --xla_disable_hlo_passes=fusion"
os.environ["PAILLIER_TPU_TRACE"]="1"
os.environ["PAILLIER_TPU_MSM_WINDOW"]="4"
import jax
jax.config.update("jax_platforms", "cpu")
from paillier_halo2_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()
from paillier_halo2_tpu.bignum.host import paillier_add_native
from paillier_halo2_tpu.gadgets import BigUintChip, Context, EncryptionPublicKeyAssigned, PaillierChip
from paillier_halo2_tpu.gadgets.range import RangeChip
from paillier_halo2_tpu.plonk.keygen import keygen
from paillier_halo2_tpu.plonk.prover import create_proof
from paillier_halo2_tpu.plonk.srs import generate_srs
from paillier_halo2_tpu.plonk.verifier import verify_proof
RNG = random.Random(777)
K, LOOKUP_BITS, ENC, LIMB = 10, 8, 16, 8
n = RNG.getrandbits(ENC) | (1 << (ENC - 1)) | 1
g, c1, c2 = (RNG.getrandbits(ENC) for _ in range(3))
res = paillier_add_native(n, c1, c2)
ctx = Context(); rc = RangeChip(ctx, LOOKUP_BITS)
bu = BigUintChip(rc, LIMB); pc = PaillierChip.construct(bu, ENC)
pk_ = EncryptionPublicKeyAssigned(bu.assign_integer(n, ENC), bu.assign_integer(g, ENC))
c = pc.add(pk_, bu.assign_integer(c1, ENC), bu.assign_integer(c2, ENC))
res_a = bu.assign_integer(res, ENC * 2); bu.assert_equal_fresh(c, res_a)
table = ctx.finalize()
print("rows", table.n_rows, flush=True)
t0=time.monotonic(); srs = generate_srs(K, seed=b"t"); print("srs", time.monotonic()-t0, flush=True)
t0=time.monotonic(); pk = keygen(table, K, LOOKUP_BITS, srs); print("keygen", time.monotonic()-t0, flush=True)
t0=time.monotonic(); proof = create_proof(pk, table, blinding_seed=b"b"); print("prove", time.monotonic()-t0, "size", len(proof), flush=True)
t0=time.monotonic(); ok = verify_proof(pk.vk, srs, proof); print("verify", time.monotonic()-t0, ok, flush=True)
