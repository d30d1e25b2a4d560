"""KZG structured reference string — dev-mode powers-of-tau, TPU-generated.

Replaces halo2's read_or_create_srs/ParamsKZG (SURVEY.md section 2.2, "KZG
commitment scheme"): a deterministic dev-mode tau is derived from a seed, the
G1 powers [tau^i]G are computed ON DEVICE as a batched fixed-base windowed
multi-scalar kernel (8-bit windows into a host-precomputed 32x256 comb table,
one gather + mixed-add per window — SRS generation is itself a TPU workload),
and the result is cached under params/ like the reference caches
kzg_bn254_{k}.srs (/root/reference/.gitignore:4 [dep]).
"""
from __future__ import annotations

import dataclasses
import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import bn254
from ..ec import host as ech
from ..ff import field_jax as f
from ..ff.host import FR_MOD
from ..ff.limbs import N_DIGITS

# anchored at the repo root (not cwd): the driver invokes bench/tests from
# arbitrary working directories and must still hit the same SRS cache.
# Fallback (ADVICE r3): an existing ./params in the cwd — pre-round-3 runs
# cached there — is used when the repo-root dir does not exist yet, so old
# caches are not silently regenerated. Env override wins over both.
_REPO_PARAMS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "params"
)


def _default_params_dir() -> str:
    if os.path.isdir(_REPO_PARAMS) or not os.path.isdir("params"):
        return _REPO_PARAMS
    return os.path.abspath("params")


PARAMS_DIR = os.environ.get("PAILLIER_TPU_PARAMS", _default_params_dir())


@dataclasses.dataclass
class SRS:
    k: int
    g1_px: np.ndarray  # (N_DIGITS, n) packed affine X, Montgomery
    g1_py: np.ndarray
    g1_inf: np.ndarray  # (n,) bool
    g2_gen: ech.PointG2
    g2_tau: ech.PointG2

    @property
    def n(self) -> int:
        return 1 << self.k

    def g1_points(self, count: int | None = None) -> list[ech.Point]:
        """Unpack the first `count` G1 powers to host affine (for tests)."""
        count = count if count is not None else self.n
        xs = f.unpack_ints(f.from_mont(bn254.SPEC, jnp.asarray(self.g1_px[:, :count])))
        ys = f.unpack_ints(f.from_mont(bn254.SPEC, jnp.asarray(self.g1_py[:, :count])))
        return [
            None if inf else (x, y)
            for x, y, inf in zip(xs, ys, self.g1_inf[:count])
        ]


def _dev_tau(seed: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(b"paillier-tpu-dev-srs" + seed).digest(), "little") % FR_MOD


def _comb_table(window_bits: int = 8):
    """Host precompute: table[w][d] = d * 2^(8w) * G (affine), w in 0..31."""
    tbl = []
    base = ech.G1
    for _ in range(N_DIGITS):
        row = [None]
        acc = None
        for _ in range((1 << window_bits) - 1):
            acc = ech.g1_add(acc, base)
            row.append(acc)
        tbl.append(row)
        for _ in range(window_bits):
            base = ech.g1_double(base)
    return tbl


@jax.jit
def _fixed_base_msm_kernel(tbl_x, tbl_y, tbl_inf, scalar_digits):
    """acc_i = sum_w table[w][digit_{w,i}] — batched comb evaluation.
    tbl_*: (N_DIGITS_windows, 256) packed table; scalar_digits: (32, N)."""
    n = scalar_digits.shape[1]
    acc = None

    def body(w, acc):
        d = jax.lax.dynamic_index_in_dim(scalar_digits, w, axis=0, keepdims=False)  # (N,)
        gx = jax.lax.dynamic_index_in_dim(tbl_x, w, axis=1, keepdims=False)  # (D, 256)
        gy = jax.lax.dynamic_index_in_dim(tbl_y, w, axis=1, keepdims=False)
        gi = jax.lax.dynamic_index_in_dim(tbl_inf, w, axis=0, keepdims=False)  # (256,)
        px = jnp.take(gx, d, axis=1)  # (D, N)
        py = jnp.take(gy, d, axis=1)
        pinf = jnp.take(gi, d)
        return bn254.padd_mixed(acc, (px, py), pinf)

    one = jnp.broadcast_to(
        jnp.asarray(f.pack_ints([bn254.SPEC.r_mod_p])).reshape(N_DIGITS, 1), (N_DIGITS, n)
    )
    acc = (one, one, jnp.zeros((N_DIGITS, n), jnp.uint32))
    acc = jax.lax.fori_loop(0, N_DIGITS, body, acc)
    return acc


def batched_fixed_base_mul(scalars: list[int]) -> bn254.JPoint:
    """[s_i]G for many scalars at once (device)."""
    tbl = _comb_table()
    flat = [p for row in tbl for p in row]
    px, py, pinf = bn254.pack_affine(flat)
    # pack_affine gives (D, 32*256); reshape to (D, 32 windows, 256 entries)
    tbl_x = jnp.asarray(px).reshape(N_DIGITS, N_DIGITS, 256)
    tbl_y = jnp.asarray(py).reshape(N_DIGITS, N_DIGITS, 256)
    tbl_inf = jnp.asarray(pinf).reshape(N_DIGITS, 256)
    sd = jnp.asarray(f.pack_ints([s % FR_MOD for s in scalars]))
    return _fixed_base_msm_kernel(tbl_x, tbl_y, tbl_inf, sd)


def generate_srs(k: int, seed: bytes = b"") -> SRS:
    """Dev-mode SRS: tau from seed, [tau^i]G1 for i < 2^k, [1]G2, [tau]G2."""
    tau = _dev_tau(seed)
    n = 1 << k
    powers = []
    acc = 1
    for _ in range(n):
        powers.append(acc)
        acc = acc * tau % FR_MOD
    jac = batched_fixed_base_mul(powers)
    # Normalize to affine ON DEVICE (batched inversion via Fermat), then pack.
    X, Y, Z = jac
    zinv = f.mont_inv(bn254.SPEC, Z)
    zinv2 = f.mont_mul(bn254.SPEC, zinv, zinv)
    ax = f.mont_mul(bn254.SPEC, X, zinv2)
    ay = f.mont_mul(bn254.SPEC, Y, f.mont_mul(bn254.SPEC, zinv2, zinv))
    inf = np.asarray(jnp.all(Z == 0, axis=0))
    g2_tau = ech.g2_mul(ech.G2, tau)
    return SRS(k, np.asarray(ax), np.asarray(ay), inf, ech.G2, g2_tau)


def _cache_path(k: int) -> str:
    return os.path.join(PARAMS_DIR, f"kzg_bn254_dev_{k}.npz")


def read_or_create_srs(k: int, seed: bytes = b"") -> SRS:
    """Disk-cached SRS, mirroring halo2-base's read_or_create_srs [dep]."""
    path = _cache_path(k)
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        g2 = [int(s) for s in z["g2"]]
        return SRS(
            int(z["k"]),
            z["g1_px"],
            z["g1_py"],
            z["g1_inf"],
            ((g2[0], g2[1]), (g2[2], g2[3])),
            ((g2[4], g2[5]), (g2[6], g2[7])),
        )
    srs = generate_srs(k, seed)
    os.makedirs(PARAMS_DIR, exist_ok=True)
    g2_strs = np.array(
        [str(c) for pt in (srs.g2_gen, srs.g2_tau) for coord in pt for c in coord]
    )
    np.savez(path, k=srs.k, g1_px=srs.g1_px, g1_py=srs.g1_py, g1_inf=srs.g1_inf, g2=g2_strs)
    return srs
