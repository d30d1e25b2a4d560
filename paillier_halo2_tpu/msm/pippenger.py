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

Round 3: on TPU the bucket loop runs on lazy signed-Montgomery accumulators
(ec/lazy_point.py — int16 digit storage, no carry chains in the kernel),
canonicalized once after the sub-accumulator merge; the CPU/XLA fallback
keeps the canonical path. Toggle with PAILLIER_TPU_LAZY=0/1.
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


import os


def _use_lazy() -> bool:
    """Lazy-Montgomery bucket loop (ec/lazy_point.py): default wherever the
    Pallas kernels run (TPU); PAILLIER_TPU_LAZY=0/1 overrides."""
    env = os.environ.get("PAILLIER_TPU_LAZY")
    if env is not None:
        return env == "1"
    return f._use_pallas()


def _schedule_defaults() -> tuple[int, int]:
    """(s_base, s_cap): sub-accumulator budget. On accelerators the Pallas
    point kernels make the extra lanes nearly free and the round-count
    reduction dominates; on the CPU fallback each extra lane costs a full
    O(n_digits^2) XLA mont_mul chain, so default to the degenerate S=1
    schedule there (tests cover S>1 by passing `subs` explicitly)."""
    if jax.default_backend() == "cpu":
        # cap=1 made the TOP window's overloaded buckets set the round count
        # for the whole gather loop: scalars < r concentrate the top window
        # into ~4 (c=4) / ~49 (c=8) key values, so max occupancy — and the
        # while_loop trip count — ran ~2^c/v times higher than every other
        # window's. Measured round 5: ONE 512-point CPU MSM at c=4 cost
        # ~26 s of pure execution (~140 rounds); cap=8 equalizes it to
        # ~18 rounds for +3 merge-tree padd instances of one-time compile.
        base, cap = "1", "8"
    else:
        base, cap = "8", "64"
    return (
        int(os.environ.get("PAILLIER_TPU_MSM_SBASE", base)),
        int(os.environ.get("PAILLIER_TPU_MSM_SCAP", cap)),
    )


def _sub_schedule(n_windows: int, window_bits: int, s_base: int | None = None,
                  s_cap: int | None = None) -> tuple[int, ...]:
    """Static per-window sub-accumulator counts.

    Scalars are < r (the BN254 Fr modulus), so the top window's keys take only
    V = (r >> shift) + 1 distinct values instead of 2^c — its buckets are
    overloaded by 2^c / V (~5.2x for c=8, since r's top byte is 0x30). With a
    single global gather-loop, that one window's max bucket occupancy sets the
    round count for ALL windows. Giving overloaded windows proportionally more
    strided sub-accumulators equalizes per-window round counts."""
    if s_base is None or s_cap is None:
        db, dc = _schedule_defaults()
        s_base = db if s_base is None else s_base
        s_cap = dc if s_cap is None else s_cap
    out = []
    for w in range(n_windows):
        v = min(1 << window_bits, (ech.R >> (window_bits * w)) + 1)
        overload = (1 << window_bits) / v
        s = s_base
        while s < s_base * overload and s < s_cap:
            s *= 2
        out.append(s)
    return tuple(out)


def _signed_keys(scalar_digits, c: int):
    """Signed window recoding: (32, N) 8-bit digits -> (W, N) int32 bucket
    keys (= |digit|, 0 dead) and (W, N) bool negation masks, where the
    scalar equals sum_w digit_w * 2^(c*w) with digit_w in [-(2^(c-1)-1),
    2^(c-1)]. Halves the live bucket range per window (2^(c-1)+1 buckets),
    letting windows grow ~1 bit at equal bucket cost; the point negation is
    a digit-wise subtract in the lazy add kernel. No carry escapes the top
    window for BN254 scalars (< 2^254, top window keys tiny)."""
    n_windows = -(-256 // c)
    d = scalar_digits.astype(jnp.uint32)
    mask = (1 << c) - 1
    raw = []
    for w in range(n_windows):
        o = c * w
        i, sh = o // 8, o % 8
        k = d[i] >> sh
        if i + 1 < N_DIGITS:
            k = k | (d[i + 1] << (8 - sh))
        if i + 2 < N_DIGITS and c + sh > 16:
            k = k | (d[i + 2] << (16 - sh))
        raw.append(k & mask)
    half = 1 << (c - 1)
    carry = jnp.zeros_like(raw[0])
    keys, negs = [], []
    for w in range(n_windows):
        k = raw[w] + carry  # <= 2^c
        over = k > half
        digit = jnp.where(over, k.astype(jnp.int32) - (1 << c), k.astype(jnp.int32))
        carry = over.astype(jnp.uint32)
        negs.append(digit < 0)
        keys.append(jnp.abs(digit))
    return jnp.stack(keys), jnp.stack(negs)


@functools.lru_cache(maxsize=None)
def _signed_keys_jit(c: int):
    return jax.jit(lambda s: jax.vmap(lambda x: _signed_keys(x, c))(s))


def _sub_schedule_signed(n_windows: int, c: int, s_base: int | None = None,
                         ) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Per-window (sub-accumulator counts, bucket-lane caps) for signed
    windows (bucket range 2^(c-1)+1).

    Tail windows see only V = (r >> c*w) + carry distinct key values; their
    single live buckets would hold n_buckets/V times more points and a flat
    (n_buckets x S) lane grid would either blow the round count or the lane
    count. Capping the window's allocated bucket lanes at V (keys provably
    never exceed it) makes lanes_w = V * S_w, so S_w can grow ~n_buckets/V
    with per-window lane cost roughly CONSTANT and round counts equalized."""
    if s_base is None:
        s_base, _ = _schedule_defaults()
    n_buckets = (1 << (c - 1)) + 1
    subs, bcaps = [], []
    for w in range(n_windows):
        v = min(n_buckets, (ech.R >> (c * w)) + 3)
        overload = n_buckets / v
        s = s_base
        while s < s_base * overload and s < 4096:
            s *= 2
        subs.append(s)
        bcaps.append(v)
    return tuple(subs), tuple(bcaps)


def _bucket_accumulate(px, py, p_inf, keys, window_bits: int,
                       subs: tuple[int, ...] | None = None):
    """Unsigned-window entry (see _bucket_impl): buckets (W, 2^window_bits)."""
    if subs is None:
        subs = _sub_schedule(keys.shape[0], window_bits)
    return _bucket_impl(px, py, p_inf, keys, None, 1 << window_bits, subs, None)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _bucket_impl(px, py, p_inf, keys, neg, n_buckets: int,
                 subs: tuple[int, ...], bcaps: tuple[int, ...] | None = None):
    """Per-(window, bucket) sums. px/py: (N_DIGITS, N) packed affine Montgomery;
    p_inf: (N,) bool; keys: (W, N) int window keys in [0, n_buckets); neg:
    optional (W, N) bool — negate the gathered point (signed windows; lazy
    path only). Returns Jacobian buckets with batch (W, n_buckets).

    Strategy: sort each window's keys, then gather-rounds where each
    (window, bucket, sub) lane accumulates every subs[w]-th point of its
    bucket's contiguous run; the subs[w] partial sums merge in a log-depth
    point-add tree afterwards. Round count = max_w ceil(max bucket occupancy
    of w / subs[w]) — a traced value driving lax.while_loop. `subs` is a
    static per-window schedule (see _sub_schedule); rows with equal counts
    are grouped into rectangular blocks so the merge stays reshape-friendly.

    TPU gathers are per-index bound (row width nearly free up to ~128 words),
    so the round body does ONE point gather from a dense (N, 16)-word packed
    table (pack_points_dense) instead of two 256-byte digit-column gathers;
    the fused add kernel unpacks in VMEM. Points at infinity need no in-loop
    mask: their keys are forced to 0 and bucket 0 is dead (count 0, weight 0).

    Contract: bases must be pairwise-distinct affine points — the in-loop
    mixed adds and merge adds run with nodouble=True (ec/bn254.py padd);
    a partial-sum collision (cryptographically negligible for distinct
    bases) degrades to infinity, never a wrong finite point."""
    n = px.shape[1]
    n_windows = keys.shape[0]
    assert len(subs) == n_windows
    packed = bn254.pack_points_dense(px, py)  # (N, 16)
    keys = jnp.where(p_inf[None, :], 0, keys.astype(jnp.int32))
    kbits = (n_buckets - 1).bit_length()
    logn = max((n - 1).bit_length(), 1)
    if kbits + logn <= 32:
        # single fused key sort (uint32): key-major, lane-minor => stable
        # order for free
        lane = jnp.arange(n, dtype=jnp.uint32)
        sk = jnp.sort((keys.astype(jnp.uint32) << logn) | lane[None, :], axis=1)
        sorted_keys = (sk >> logn).astype(jnp.int32)
        order = (sk & ((1 << logn) - 1)).astype(jnp.int32)
    else:
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

    # Static lane maps: rows grouped by (sub-count, bucket-lane cap) into
    # rectangular blocks, block layout (rows, Bcap, S) flattened C-order
    # onto one lane axis. bcaps (signed schedule) shrink tail windows whose
    # keys provably stay below the cap, so their lanes go to more
    # sub-accumulators instead of dead buckets.
    if bcaps is None:
        bcaps = (n_buckets,) * n_windows
    blocks: list[tuple[int, int, list[int]]] = []
    for w in sorted(range(n_windows), key=lambda w: (subs[w], bcaps[w])):
        if blocks and blocks[-1][0] == subs[w] and blocks[-1][1] == bcaps[w]:
            blocks[-1][2].append(w)
        else:
            blocks.append((subs[w], bcaps[w], [w]))
    win_np, bkt_np, sub_np, nsub_np = [], [], [], []
    for s, bc, rows in blocks:
        nr = len(rows)
        win_np.append(np.repeat(np.array(rows, np.int32), bc * s))
        bkt_np.append(np.tile(np.repeat(np.arange(bc, dtype=np.int32), s), nr))
        sub_np.append(np.tile(np.arange(s, dtype=np.int32), nr * bc))
        nsub_np.append(np.full(nr * bc * s, s, np.int32))
    win_map = jnp.asarray(np.concatenate(win_np))
    bkt_map = jnp.asarray(np.concatenate(bkt_np))
    sub_map = jnp.asarray(np.concatenate(sub_np))
    nsub_map = jnp.asarray(np.concatenate(nsub_np))
    n_lanes = int(win_map.shape[0])

    seg_l = jnp.take(seg_start.reshape(-1), win_map * n_buckets + bkt_map)
    counts_l = jnp.take(counts.reshape(-1), win_map * n_buckets + bkt_map)
    order_flat = order.reshape(-1)

    max_rounds = jnp.max((counts_l + nsub_map - 1) // nsub_map)
    use_lazy = _use_lazy()
    assert neg is None or use_lazy, "signed windows need the lazy kernels"
    neg_flat = None if neg is None else neg.reshape(-1)
    if use_lazy:
        # round-3 fast path: accumulators live as int16 lazy signed digits
        # (ec/lazy_point.py) — no carry chains in the kernel, half the HBM
        # traffic; canonicalized once after the merge below.
        from ..ec import lazy_point as lzp

        pad_l = (-n_lanes) % lzp.BLOCK
        acc = lzp.inf_acc(bn254.SPEC, (n_lanes + pad_l,))
        if pad_l:
            seg_lp = jnp.pad(seg_l, (0, pad_l))
            counts_lp = jnp.pad(counts_l, (0, pad_l))  # count 0 => always off
            sub_mapp = jnp.pad(sub_map, (0, pad_l))
            nsub_mapp = jnp.pad(nsub_map, (0, pad_l), constant_values=1)
            win_mapp = jnp.pad(win_map, (0, pad_l))
        else:
            seg_lp, counts_lp, sub_mapp, nsub_mapp, win_mapp = (
                seg_l, counts_l, sub_map, nsub_map, win_map)
    else:
        acc = _inf_points((n_lanes,))

    def cond(state):
        r, _ = state
        return r < max_rounds

    def body(state):
        r, acc = state
        if use_lazy:
            j = sub_mapp + r * nsub_mapp
            pos = jnp.clip(seg_lp + j, 0, n - 1)
            idx = jnp.take(order_flat, win_mapp * n + pos)  # pad lanes: win 0
            g = jnp.take(packed, idx, axis=0)
            mask_off = j >= counts_lp
            negl = None
            if neg_flat is not None:
                negl = jnp.take(neg_flat, win_mapp * n + idx)
            from ..ec import lazy_point as lzp

            acc = lzp.padd_mixed_packed_lazy(bn254.SPEC, *acc, g, mask_off,
                                             neg=negl)
        else:
            j = sub_map + r * nsub_map  # index within the bucket's sorted run
            pos = jnp.clip(seg_l + j, 0, n - 1)
            idx = jnp.take(order_flat, win_map * n + pos)  # original point indices
            g = jnp.take(packed, idx, axis=0)  # (L, 16) dense rows
            mask_off = j >= counts_l
            acc = bn254.padd_mixed_packed(acc, g, mask_off, nodouble=True)
        return r + 1, acc

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))

    # Merge each block's S sub-accumulators with a log-depth roll-and-add
    # fold. The fold body is shape-constant (the roll shift is traced), so
    # each block costs ONE compiled point-add instance regardless of S —
    # step i only depends on lanes < S >> i being correct, so no masking.
    # Then restore original window-row order.
    parts = []
    row_order: list[int] = []
    off = 0
    for s, bc, rows in blocks:
        nr = len(rows)
        lb = nr * bc * s
        blk = tuple(c[:, off : off + lb].reshape(N_DIGITS, nr, bc, s) for c in acc)
        if s > 1:
            if use_lazy:
                from ..ec import lazy_point as lzp

                padm = (-lb) % lzp.BLOCK

                def merge_body(i, t, s=s, padm=padm, nr=nr, bc=bc, lb=lb):
                    half = s >> (i + 1)
                    flat = []
                    for c in t:
                        sh = jnp.roll(c, -half, axis=3).reshape(N_DIGITS, lb)
                        cf = c.reshape(N_DIGITS, lb)
                        if padm:
                            sh = jnp.pad(sh, [(0, 0), (0, padm)])
                            cf = jnp.pad(cf, [(0, 0), (0, padm)])
                        flat.extend([cf, sh])
                    o = lzp.padd_lazy(
                        bn254.SPEC, flat[0], flat[2], flat[4], flat[1], flat[3], flat[5]
                    )
                    return tuple(
                        c[:, :lb].reshape(N_DIGITS, nr, bc, s) for c in o
                    )

            else:

                def merge_body(i, t, s=s):
                    half = s >> (i + 1)
                    shifted = tuple(jnp.roll(c, -half, axis=3) for c in t)
                    return bn254.padd(t, shifted, nodouble=True)

            blk = jax.lax.fori_loop(0, s.bit_length() - 1, merge_body, blk)
        first = tuple(c[..., 0] for c in blk)  # (N_DIGITS, nr, bc)
        if bc < n_buckets:
            # capped windows: pad the dead bucket range with (0, 0, Z=0) —
            # the canonical infinity encoding for every downstream consumer
            first = tuple(
                jnp.pad(c, [(0, 0), (0, 0), (0, n_buckets - bc)]) for c in first
            )
        parts.append(first)
        row_order.extend(rows)
        off += lb
    merged = tuple(
        jnp.concatenate([p[i] for p in parts], axis=1) if len(parts) > 1 else parts[0][i]
        for i in range(3)
    )
    inv = jnp.asarray(np.argsort(np.array(row_order)))
    merged = tuple(jnp.take(c, inv, axis=1) for c in merged)
    if use_lazy:
        from ..ec import lazy_point as lzp

        merged = lzp.canonicalize_jp(bn254.SPEC, *merged)
    return merged


@functools.partial(jax.jit, static_argnums=(1,))
@functools.partial(jax.jit, static_argnums=(1,))
def _window_sums(buckets, n_buckets: int):
    """T_w = sum_b b * B_{w,b} via the suffix-sum identity
    T = sum_{b>=1} S_b with S_b = sum_{b'>=b} B_{b'}, computed at full
    (W, B) lane width in log depth: a Hillis-Steele suffix scan then a
    Hillis-Steele full reduction over the bucket axis — 2*ceil(log2 B)
    sequential adds instead of 2*(B-1), keeping the batch large enough for
    the Pallas mulmod path. Works for any n_buckets (signed windows use
    2^(c-1)+1), not just powers of two."""
    idx = jnp.arange(n_buckets)
    log_b = (n_buckets - 1).bit_length()

    def masked(p: bn254.JPoint, valid) -> bn254.JPoint:
        # invalid lanes become infinity (Z = 0); padd resolves them.
        return (p[0], p[1], jnp.where(valid, p[2], 0))

    def scan_body(i, s):
        step = 1 << i  # traced: jnp.roll accepts dynamic shifts
        shifted = tuple(jnp.roll(c, -step, axis=2) for c in s)
        return bn254.padd(s, masked(shifted, idx < n_buckets - step))

    s = jax.lax.fori_loop(0, log_b, scan_body, buckets)

    def reduce_body(i, t):
        step = 1 << i
        shifted = tuple(jnp.roll(c, -step, axis=2) for c in t)
        return bn254.padd(t, masked(shifted, idx < n_buckets - step))

    t = masked(s, idx >= 1)  # drop S_0 (bucket weight starts at 1)
    t = jax.lax.fori_loop(0, log_b, reduce_body, t)
    return tuple(c[:, :, 0] for c in t)


def _signed_window_bits(n: int) -> int | None:
    """Signed-window size for the lazy path, or None for unsigned windows.
    PAILLIER_TPU_MSM_SIGNED=<c> forces (0 disables). Default on the lazy
    (TPU) path scales with the point count: c=11 measured best at 2^20 on
    v5e (589.9k pts/s vs 304k unsigned c=8); smaller MSMs (the prover's
    per-column commits) shrink c so bucket-lane state stays proportional
    to the work."""
    env = os.environ.get("PAILLIER_TPU_MSM_SIGNED")
    if env is not None:
        c = int(env)
        return c if c > 0 else None
    if not _use_lazy():
        return None
    if n >= (1 << 19):
        return 11
    if n >= (1 << 16):
        return 9
    return 8


def _lanes_per_poly(subs, bcaps) -> int:
    return sum(s * b for s, b in zip(subs, bcaps))


def msm_packed_multi(px, py, p_inf, scalar_digits_multi, window_bits: int = 8) -> list[ech.Point]:
    """Batched MSMs sharing one base set: scalar_digits_multi is (P, 32, N);
    returns P host affine results. The poly axis folds into the window axis,
    so P commitments cost one kernel invocation (bucket rounds amortize) —
    the natural shape for committing a whole proof phase's columns at once.

    On the lazy (TPU) path, windows are SIGNED c-bit digits (default c=12,
    _signed_window_bits): 2^(c-1)+1 buckets per window and a negation mask
    into the fused add kernel, cutting total bucket adds vs unsigned c=8."""
    sd = jnp.asarray(scalar_digits_multi)
    assert sd.ndim == 3
    n_polys = sd.shape[0]
    c_signed = _signed_window_bits(sd.shape[2])
    if c_signed is not None:
        n_windows = -(-256 // c_signed)
        n_buckets = (1 << (c_signed - 1)) + 1
        subs, bcaps = _sub_schedule_signed(n_windows, c_signed)
        # bound bucket-lane memory: a prover phase commits dozens of
        # columns at once, and lane state (3 x 32 x int16 + canonicalize
        # transients) must not scale with the column count unchecked.
        # Multi-poly batches are PADDED to one canonical group size with
        # zero-scalar polys (dead bucket 0 only), so every prover phase —
        # advice, lookup, permutation, quotient — reuses ONE compiled
        # bucket graph per point count instead of one per column count
        # (Mosaic compiles are not persistently cached over the axon
        # remote-compile path; distinct shapes cost ~50 s each, cold).
        max_lanes = int(os.environ.get("PAILLIER_TPU_MSM_MAX_LANES", str(1 << 21)))
        per_poly = _lanes_per_poly(subs, bcaps)
        group = max(1, min(int(os.environ.get("PAILLIER_TPU_MSM_GROUP", "8")),
                           max_lanes // max(per_poly, 1)))
        if n_polys > 1 and n_polys != group:
            out = []
            for i in range(0, n_polys, group):
                chunk = sd[i : i + group]
                pad = group - chunk.shape[0]
                if pad:
                    chunk = jnp.concatenate(
                        [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                    )
                out.extend(
                    msm_packed_multi(px, py, p_inf, chunk, window_bits)[
                        : group - pad
                    ]
                )
            return out
        # jitted recode (cached per c): ~150 small ops that would otherwise
        # dispatch eagerly one by one (~1s over the axon tunnel at 2^20)
        keys, negs = _signed_keys_jit(c_signed)(sd)  # (P, W, N) x2
        keys = keys.reshape(n_polys * n_windows, -1)
        negs = negs.reshape(n_polys * n_windows, -1)
        buckets = _bucket_impl(
            jnp.asarray(px), jnp.asarray(py), jnp.asarray(p_inf),
            keys, negs, n_buckets, subs * n_polys, bcaps * n_polys,
        )
        shift = c_signed
    else:
        keys = jax.vmap(lambda s: _keys_from_digits(s, window_bits))(sd)  # (P, W, N)
        n_windows = keys.shape[1]
        keys = keys.reshape(n_polys * n_windows, -1)
        n_buckets = 1 << window_bits
        subs = _sub_schedule(n_windows, window_bits) * n_polys  # row = p*W + w
        buckets = _bucket_accumulate(
            jnp.asarray(px), jnp.asarray(py), jnp.asarray(p_inf), keys,
            window_bits, subs,
        )
        shift = window_bits
    tw = _window_sums(buckets, n_buckets)
    pts = bn254.unpack_jacobian(tw)  # (P*W) window sums, poly-major
    out = []
    for pi in range(n_polys):
        acc = None
        for p in reversed(pts[pi * n_windows : (pi + 1) * n_windows]):
            for _ in range(shift):
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
