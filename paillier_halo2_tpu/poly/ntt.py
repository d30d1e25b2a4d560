"""Radix-2 NTT/iNTT over Fr on digit vectors — TPU replacement for
halo2-axiom's rayon-parallel FFT (SURVEY.md section 2.2, "NTT/iNTT").

Cooley-Tukey DIT with a host-precomputed bit-reversal gather followed by k
butterfly stages; every stage is one batched Montgomery multiply over n/2
lanes plus add/sub — static shapes, jit-friendly. Twiddles are baked per
(k, inverse) and cached. The multi-chip version shards the leading stages and
exchanges via all-to-all (SURVEY.md section 2.3); see mesh/.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff import field_jax as f
from ..ff import host
from ..ff.limbs import N_DIGITS


@functools.lru_cache(maxsize=None)
def _bitrev(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(k: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Per-stage twiddle digit arrays (Montgomery form), stage s has 2^s."""
    p = host.FR_MOD
    out = []
    for s in range(k):
        w = host.root_of_unity(s + 1)
        if inverse:
            w = pow(w, p - 2, p)
        half = 1 << s
        tw = f.pack_ints([x * f.FR.r_mod_p % p for x in _powers(w, half)])
        out.append(tw)
    return tuple(out)


def _powers(base: int, count: int) -> list[int]:
    acc, out = 1, []
    for _ in range(count):
        out.append(acc)
        acc = acc * base % host.FR_MOD
    return out


def _use_scan_stages() -> bool:
    """Stage-loop lowering choice. The unrolled form emits k mont_mul
    subgraphs — fastest at runtime but XLA:CPU's LLVM backend spends ~1.5 s
    compiling EACH mont_mul instance, so a k=14 transform costs ~20 s of
    compile per distinct batch shape (the round-2 driver dryrun timed out on
    exactly this). The scanned form runs the k stages through ONE fori_loop
    body (gather-based butterflies, twiddles indexed out of a single
    root-power table), compiling one mont_mul regardless of k. Default: scan
    on CPU (tests, virtual meshes, driver dryrun), unrolled on accelerators.
    PAILLIER_TPU_NTT_SCAN=0/1 overrides."""
    import os

    env = os.environ.get("PAILLIER_TPU_NTT_SCAN")
    if env is not None:
        return env == "1"
    from ..utils.lean import compile_lean

    return compile_lean()


@functools.lru_cache(maxsize=None)
def _root_pow_table(k: int, inverse: bool) -> np.ndarray:
    """Montgomery digits of w^i for i < 2^(k-1), w the (inverse) 2^k-th root.
    Stage s of the scanned NTT reads its 2^s twiddles at stride n >> (s+1)."""
    p = host.FR_MOD
    w = host.root_of_unity(k)
    if inverse:
        w = pow(w, p - 2, p)
    count = max(1 << (k - 1), 1)
    return f.pack_ints([x * f.FR.r_mod_p % p for x in _powers(w, count)])


@functools.partial(jax.jit, static_argnums=(1, 2))
def ntt(x: jnp.ndarray, k: int, inverse: bool = False) -> jnp.ndarray:
    """In-order NTT along the LAST axis of a (N_DIGITS, ..., 2^k)
    Montgomery-form array — optional middle axes batch independent
    polynomials through one dispatch chain (the prover transforms a whole
    phase's columns at once).

    Forward: evaluations over H in natural index order (omega^i at index i).
    Inverse: includes the 1/n scaling.
    """
    n = 1 << k
    assert x.shape[0] == N_DIGITS and x.shape[-1] == n, x.shape
    batch = x.shape[1:-1]
    spec = f.FR
    x = jnp.take(x, jnp.asarray(_bitrev(k)), axis=-1)
    ones = (1,) * len(batch)
    if k and _use_scan_stages():
        tw_tab = jnp.asarray(_root_pow_table(k, inverse))  # (D, n/2)
        j = jnp.arange(n, dtype=jnp.int32)

        def body(s, x):
            half = jnp.left_shift(jnp.int32(1), s)
            partner = j ^ half
            is_hi = (j & half) != 0
            xp = jnp.take(x, partner, axis=-1)
            u = jnp.where(is_hi, xp, x)
            vr = jnp.where(is_hi, x, xp)
            stride = jnp.right_shift(jnp.int32(n), s + 1)
            tw_idx = (j & (half - 1)) * stride
            tw = jnp.take(tw_tab, tw_idx, axis=-1).reshape(
                (N_DIGITS,) + ones + (n,)
            )
            v = f.mont_mul(spec, vr, tw)
            return jnp.where(is_hi, f.sub(spec, u, v), f.add(spec, u, v))

        x = jax.lax.fori_loop(0, k, body, x)
    else:
        for s, tw in enumerate(_stage_twiddles(k, inverse)):
            half = 1 << s
            xb = x.reshape(N_DIGITS, *batch, n >> (s + 1), 2, half)
            u = xb[..., 0, :]
            v = f.mont_mul(
                spec, xb[..., 1, :], jnp.asarray(tw).reshape(N_DIGITS, *ones, 1, half)
            )
            x = jnp.concatenate(
                [f.add(spec, u, v)[..., None, :], f.sub(spec, u, v)[..., None, :]],
                axis=-2,
            )
            x = x.reshape(N_DIGITS, *batch, n)
    if inverse:
        n_inv = pow(n, host.FR_MOD - 2, host.FR_MOD)
        scale = f.pack_ints([n_inv * spec.r_mod_p % host.FR_MOD])
        x = f.mont_mul(spec, x, jnp.asarray(scale).reshape(N_DIGITS, *ones, 1))
    return x


def make_ntt(k: int, inverse: bool = False):
    """Jitted NTT closure for a fixed size."""
    return jax.jit(lambda x: ntt(x, k, inverse))


# -- host oracle -------------------------------------------------------------


def ntt_host(coeffs: list[int], k: int, inverse: bool = False) -> list[int]:
    """Python-int radix-2 NTT oracle for tests."""
    p = host.FR_MOD
    n = 1 << k
    assert len(coeffs) == n
    a = [c % p for c in coeffs]
    a = [a[i] for i in _bitrev(k)]
    for s in range(k):
        half = 1 << s
        w = host.root_of_unity(s + 1)
        if inverse:
            w = pow(w, p - 2, p)
        ws = _powers(w, half)
        for start in range(0, n, 2 * half):
            for j in range(half):
                u = a[start + j]
                v = a[start + half + j] * ws[j] % p
                a[start + j] = (u + v) % p
                a[start + half + j] = (u - v) % p
    if inverse:
        n_inv = pow(n, p - 2, p)
        a = [x * n_inv % p for x in a]
    return a
