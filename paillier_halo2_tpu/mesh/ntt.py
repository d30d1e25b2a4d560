"""Distributed four-step NTT: local butterfly stages on-chip, global stages
via all-to-all transposes (SURVEY.md section 2.3, "distributed NTT").

Bailey decomposition with n1 = d (mesh size), n2 = N/d, input A[j1, j2]
row-major sharded by j1:

  1. all-to-all transpose -> each chip holds all j1 for a j2-chunk
  2. local column NTTs of length n1 (w_N^{n2} twiddles)
  3. twiddle multiply by w_N^{k1*j2} (precomputed, sharded like the data)
  4. all-to-all transpose -> each chip holds the full j2 row for its k1
  5. local row NTT of length n2

Output X[k2*n1 + k1] lands as O[k1, k2] with k1 = chip index — the natural
four-step strided layout; `reorder_output` produces the flat natural order.

The inverse transform is the same decomposition over w^{-1}; the two local
inverse sub-NTTs contribute 1/d * 1/n2 = 1/n, so no extra scaling step.
Batched middle axes (the prover transforms whole column phases at once) ride
through every stage unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ff import field_jax as f
from ..ff import host
from ..ff.limbs import N_DIGITS
from ..poly import ops
from ..poly.ntt import ntt

SPEC = f.FR
PRIME = host.FR_MOD


@functools.lru_cache(maxsize=None)
def _step3_twiddles(k: int, d: int, inverse: bool) -> np.ndarray:
    """(N_DIGITS, d, n2) Montgomery digits of w_N^{±k1*j2}."""
    n = 1 << k
    n2 = n // d
    w = host.root_of_unity(k)
    if inverse:
        w = pow(w, PRIME - 2, PRIME)
    vals = []
    for k1 in range(d):
        wk1 = pow(w, k1, PRIME)
        acc = 1
        for j2 in range(n2):
            vals.append(acc * f.FR.r_mod_p % PRIME)
            acc = acc * wk1 % PRIME
    return ops.pack_values([v for v in vals]).reshape(N_DIGITS, d, n2)


@functools.lru_cache(maxsize=128)
def _ntt_run_fn(mesh, k: int, inverse: bool, B: int):
    """Cached shard_map program for one (mesh, k, inverse, batch-width)
    four-step NTT. Defined per-call this re-traced/re-lowered the whole
    n-device program every invocation (same pathology as mesh/msm.py
    _local_buckets_fn — see its docstring; measured round 5)."""
    d = mesh.devices.size
    n = 1 << k
    n2 = n // d
    k1_bits = d.bit_length() - 1

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, "x"), P(None, None, "x")),
        out_specs=P(None, None, "x", None),
        check_vma=False,
    )
    def run(local, tw_local):
        # local: (D, B, n2) = row j1 = this chip; tw_local: (D, d, n2/d)
        m = n2 // d
        a = local.reshape(N_DIGITS, B, d, m)
        # 1. transpose: now axis 2 = source chip = j1, trailing = j2 chunk
        a = jax.lax.all_to_all(a, "x", split_axis=2, concat_axis=2)
        # 2. column NTTs of length d over axis 2 (batch over B and j2 chunk)
        a = jax.vmap(lambda v: ntt(v, k1_bits, inverse), in_axes=3, out_axes=3)(a)
        # 3. twiddle: local j2 chunk of w^{±k1*j2}; tw_local is (D, d(k1), m)
        a = f.mont_mul(SPEC, a, tw_local[:, None])
        # 4. transpose back: full j2 row for own k1. all_to_all with distinct
        # split/concat axes inserts the source-device axis as the MINOR
        # dimension at concat position -> (D, B, m, d); global j2 = p*m + l,
        # so swap to (D, B, d, m) before flattening.
        a = jax.lax.all_to_all(a, "x", split_axis=2, concat_axis=3)
        a = jnp.swapaxes(a, 2, 3)
        # 5. row NTT of length n2
        a = ntt(a.reshape(N_DIGITS, B, n2), k - k1_bits, inverse)
        return a[:, :, None, :]  # (D, B, 1, n2) -> global (D, B, d, n2)

    return jax.jit(run)


def ntt_distributed(mesh, x: jnp.ndarray, k: int, inverse: bool = False):
    """NTT of a (N_DIGITS, *batch, 2^k) Montgomery array, point axis sharded
    over mesh axis 'x'. Returns (N_DIGITS, *batch, d, n2) in four-step
    layout (use `reorder_output` for natural order)."""
    d = mesh.devices.size
    n = 1 << k
    n2 = n // d
    assert n % (d * d) == 0, "need d^2 | n for the all-to-all chunking"
    k1_bits = d.bit_length() - 1
    assert 1 << k1_bits == d, "mesh size must be a power of two"
    batch = x.shape[1:-1]
    xb = x.reshape(N_DIGITS, -1, n)  # fold batch axes into one
    B = xb.shape[1]
    tw = jnp.asarray(_step3_twiddles(k, d, inverse))

    # Chip q's step-3 layout is (all k1, j2 in chunk q); sharding the global
    # twiddle array along its j2 axis hands each chip exactly that block.
    out = _ntt_run_fn(mesh, k, inverse, B)(xb, tw)
    return out.reshape(N_DIGITS, *batch, d, n2) if batch else out[:, 0]


def reorder_output(out) -> jnp.ndarray:
    """(D, *batch, d, n2) four-step layout -> (D, *batch, n) natural order:
    X[k2*d + k1]."""
    d, n2 = out.shape[-2], out.shape[-1]
    return jnp.moveaxis(out, -2, -1).reshape(*out.shape[:-2], d * n2)


def ntt_natural(mesh, x: jnp.ndarray, k: int, inverse: bool = False) -> jnp.ndarray:
    """Distributed NTT returning natural index order (one extra reshard)."""
    return reorder_output(ntt_distributed(mesh, x, k, inverse))


def ntt_reference(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return ntt(x, k)
