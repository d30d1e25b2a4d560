"""Pippenger multi-scalar multiplication on TPU — replacement for
halo2curves' rayon MSM (SURVEY.md section 2.2, "Pippenger MSM").

TPU-first formulation (no data-dependent scatters):
- window size c divides 8 so window keys slice directly out of the 8-bit
  scalar digit rows (c=8: keys ARE the digit rows; c=4: nibbles).
- bucket accumulation by sorting each window's keys (argsort) and then
  *gather-rounds*: round r gathers, for every (window, bucket) lane, the r-th
  point of that bucket's contiguous run in sorted order and adds it with a
  mixed Jacobian+affine add; masked lanes add infinity (a no-op). The round
  count is the max bucket occupancy — a traced value driving lax.while_loop,
  so shapes stay static while work adapts to the data (~4x the mean for
  random scalars; degenerate all-equal scalars degrade to N rounds but stay
  correct).
- bucket weighting via the suffix-sum identity sum_b b*B_b = sum_b S_b with
  S_b = sum_{b'>=b} B_b', computed as a sequential fold (compile-size O(1)
  point-adds; 2*(2^c-1) batched adds over the window lane axis at runtime).
- final window Horner combine on host (cheap doublings on Python ints).

The multi-chip version row-shards points/scalars and combines per-chip partial
sums (SURVEY.md section 2.3: "sharded MSM"); see mesh/.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import bn254
from ..ec import host as ech
from ..ff import field_jax as f
from ..ff.limbs import DIGIT_BITS, N_DIGITS


def _keys_from_digits(scalar_digits: jnp.ndarray, window_bits: int) -> jnp.ndarray:
    """(N_DIGITS, N) 8-bit digits -> (n_windows, N) c-bit window keys."""
    assert DIGIT_BITS % window_bits == 0
    per_digit = DIGIT_BITS // window_bits
    if per_digit == 1:
        return scalar_digits
    mask = (1 << window_bits) - 1
    parts = [
        (scalar_digits >> (window_bits * j)) & mask for j in range(per_digit)
    ]  # part j = j-th sub-window of each digit, LSB first
    stacked = jnp.stack(parts, axis=1)  # (N_DIGITS, per_digit, N)
    return stacked.reshape(N_DIGITS * per_digit, -1)


def _inf_points(batch_shape) -> bn254.JPoint:
    one = jnp.broadcast_to(
        jnp.asarray(f.pack_ints([bn254.SPEC.r_mod_p])).reshape((N_DIGITS,) + (1,) * len(batch_shape)),
        (N_DIGITS,) + tuple(batch_shape),
    )
    return (one, one, jnp.zeros((N_DIGITS,) + tuple(batch_shape), jnp.uint32))


@functools.partial(jax.jit, static_argnums=(4,))
def _bucket_accumulate(px, py, p_inf, keys, window_bits: int):
    """Per-(window, bucket) sums. px/py: (N_DIGITS, N) packed affine Montgomery;
    p_inf: (N,) bool; keys: (W, N) int window keys. Returns Jacobian buckets
    with batch (W, 2^c)."""
    n = px.shape[1]
    n_windows = keys.shape[0]
    n_buckets = 1 << window_bits
    keys = jnp.where(p_inf[None, :], 0, keys.astype(jnp.int32))
    order = jnp.argsort(keys, axis=1)  # (W, N) stable
    sorted_keys = jnp.take_along_axis(keys, order, axis=1)

    # Histogram via per-window binary search over the sorted keys — a scatter
    # here would bake O(W*N) constant indices into the graph (this XLA build
    # lowers scatters pathologically; compile time became O(N)).
    targets = jnp.arange(n_buckets, dtype=jnp.int32)
    seg_start = jax.vmap(lambda row: jnp.searchsorted(row, targets, side="left"))(sorted_keys)
    seg_end = jax.vmap(lambda row: jnp.searchsorted(row, targets, side="right"))(sorted_keys)
    counts = (seg_end - seg_start).astype(jnp.int32)
    seg_start = seg_start.astype(jnp.int32)
    counts = counts.at[:, 0].set(0)  # bucket 0 contributes nothing

    acc = _inf_points((n_windows, n_buckets))
    max_rounds = jnp.max(counts)

    def cond(state):
        r, _ = state
        return r < max_rounds

    def body(state):
        r, acc = state
        pos = jnp.clip(seg_start + r, 0, n - 1)  # (W, B)
        idx = jnp.take_along_axis(order, pos, axis=1)  # original point indices
        gx = jnp.take(px, idx, axis=1)  # (D, W, B)
        gy = jnp.take(py, idx, axis=1)
        g_inf = jnp.take(p_inf, idx)  # (W, B)
        mask_off = (r >= counts) | g_inf
        acc = bn254.padd_mixed(acc, (gx, gy), mask_off)
        return r + 1, acc

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
    return acc


@functools.partial(jax.jit, static_argnums=(1,))
def _window_sums(buckets, n_buckets: int):
    """T_w = sum_b b * B_{w,b} via the suffix-sum identity
    T = sum_{b>=1} S_b with S_b = sum_{b'>=b} B_{b'}, computed at full
    (W, B) lane width in log depth: a Hillis-Steele suffix scan
    (log2 B masked point-adds) then a pairwise tree reduction over the
    bucket axis (log2 B more) — 2*log2(B) sequential adds instead of
    2*(B-1), keeping the batch large enough for the Pallas mulmod path."""
    idx = jnp.arange(n_buckets)
    log_b = n_buckets.bit_length() - 1

    def masked(p: bn254.JPoint, valid) -> bn254.JPoint:
        # invalid lanes become infinity (Z = 0); padd resolves them.
        return (p[0], p[1], jnp.where(valid, p[2], 0))

    def scan_body(i, s):
        step = 1 << i  # traced: jnp.roll accepts dynamic shifts
        shifted = tuple(jnp.roll(c, -step, axis=2) for c in s)
        return bn254.padd(s, masked(shifted, idx < n_buckets - step))

    s = jax.lax.fori_loop(0, log_b, scan_body, buckets)

    def reduce_body(i, t):
        half = n_buckets >> (i + 1)
        shifted = tuple(jnp.roll(c, -half, axis=2) for c in t)
        return masked(bn254.padd(t, shifted), idx < half)

    t = masked(s, idx >= 1)  # drop S_0 (bucket weight starts at 1)
    t = jax.lax.fori_loop(0, log_b, reduce_body, t)
    return tuple(c[:, :, 0] for c in t)


def msm_packed_multi(px, py, p_inf, scalar_digits_multi, window_bits: int = 8) -> list[ech.Point]:
    """Batched MSMs sharing one base set: scalar_digits_multi is (P, 32, N);
    returns P host affine results. The poly axis folds into the window axis,
    so P commitments cost one kernel invocation (bucket rounds amortize) —
    the natural shape for committing a whole proof phase's columns at once."""
    sd = jnp.asarray(scalar_digits_multi)
    assert sd.ndim == 3
    n_polys = sd.shape[0]
    keys = jax.vmap(lambda s: _keys_from_digits(s, window_bits))(sd)  # (P, W, N)
    n_windows = keys.shape[1]
    keys = keys.reshape(n_polys * n_windows, -1)
    buckets = _bucket_accumulate(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(p_inf), keys, window_bits
    )
    tw = _window_sums(buckets, 1 << window_bits)
    pts = bn254.unpack_jacobian(tw)  # (P*W) window sums, poly-major
    out = []
    for pi in range(n_polys):
        acc = None
        for p in reversed(pts[pi * n_windows : (pi + 1) * n_windows]):
            for _ in range(window_bits):
                acc = ech.g1_double(acc)
            acc = ech.g1_add(acc, p)
        out.append(acc)
    return out


def msm_packed(px, py, p_inf, scalar_digits, window_bits: int = 8) -> ech.Point:
    """MSM over pre-packed affine bases and standard-form scalar digits.
    Returns the host affine result (final Horner combine on host)."""
    return msm_packed_multi(px, py, p_inf, jnp.asarray(scalar_digits)[None], window_bits)[0]


def msm(points: list[ech.Point], scalars: list[int], window_bits: int = 8) -> ech.Point:
    """Convenience entry: host points + host int scalars."""
    assert len(points) == len(scalars)
    px, py, p_inf = bn254.pack_affine(points)
    sd = f.pack_ints([s % ech.R for s in scalars])
    return msm_packed(px, py, p_inf, sd, window_bits)
