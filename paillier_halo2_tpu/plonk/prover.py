"""Proof creation — replacement for halo2-axiom's create_proof
(SURVEY.md sections 2.2 and 3.3). The hot loops match the reference call
stack: per-column iNTT + MSM commitments, grand-product scans, quotient
construction on the extended coset via NTTs, and GWC multi-open — all of it
batched digit-vector arithmetic on device; only transcript hashing and tiny
scalar plumbing run on host.

Constraint order (the y-combination; verifier.py must match exactly):
  1. per advice column c: q_c * (a_c + a_c(w) * a_c(w2) - a_c(w3))
  2. l_0 * (Z_0 - 1)
  3. per perm chunk i: active * [Z_i(wX) * prod(col + beta*sigma + gamma)
                               - Z_i(X) * prod(col + beta*id + gamma)]
  4. per chunk i>0: l_0 * (Z_i - Z_{i-1}(w^u X))
  5. l_u * (Z_last - 1)
  6. per lookup column:
     a. l_0 * (Zl - 1)
     b. l_u * (Zl - 1)
     c. active * [Zl(wX)*(A'+beta)(S'+gamma) - Zl(X)*(A+beta)(S+gamma)]
     d. active * (A'-S') * (A' - A'(w^-1 X))
     e. l_0 * (A' - S')
"""
from __future__ import annotations

import hashlib
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ec import host as ech
from ..ff import field_jax as f
from ..ff import host
from ..gadgets.context import VirtualTable
from .params import BLINDING_ROWS
from ..poly import ops
from .keygen import EXTENDED_RATE_BITS, ProvingKey
from .kzg import commit, commit_many
from .layout import lookup_columns, witness_columns
from .transcript import TranscriptWriter

P = host.FR_MOD
SPEC = f.FR


def _selfcheck() -> bool:
    """Heavy in-flight algebraic self-checks (SHPLONK L(u), quotient degree
    tail, GWC evaluator): opt-IN via PAILLIER_TPU_SELFCHECK=1."""
    return os.environ.get("PAILLIER_TPU_SELFCHECK", "") not in ("", "0")


def _closing_check() -> bool:
    """Cheap grand-product closing assertions (one tiny single-lane d2h
    each): ON by default, so create_proof on an unsatisfiable witness fails
    fast with a localizing message instead of silently emitting an invalid
    proof (ADVICE r4). Opt-OUT with PAILLIER_TPU_SELFCHECK=0 to benchmark
    the absolute minimal-sync path (d2h readbacks per proof drop by 2)."""
    return os.environ.get("PAILLIER_TPU_SELFCHECK", "") != "0"


def _blind_tail(vals: np.ndarray, usable: int, seed: bytes, tag: bytes) -> np.ndarray:
    out = vals.copy()
    n = len(out)
    for r in range(usable, n):
        h = hashlib.blake2b(seed + tag + r.to_bytes(4, "little")).digest()
        out[r] = int.from_bytes(h, "little") % P
    return out


def _permuted_lookup(a_active: np.ndarray, lookup_bits: int, usable: int):
    """halo2 permuted-lookup pair construction over the active region,
    vectorized (the row loop was O(usable) Python — too slow at k=20).
    Returns (a_sorted, s_sorted) as int arrays of length usable.

    Rule: A' = sorted A; at every first occurrence S'[i] = A'[i]; the holes
    (where A'[i] == A'[i-1]) take the unused table values ascending, then the
    table's surplus zeros. Table multiset over active rows: {0..2^l-1} plus
    (usable - 2^l) zeros."""
    a_sorted = np.sort(np.asarray([int(v) for v in a_active], dtype=np.int64))
    n_table = 1 << lookup_bits
    if len(a_sorted) and (a_sorted[0] < 0 or a_sorted[-1] >= n_table):
        raise ValueError("lookup input outside table range")
    first = np.empty(usable, dtype=bool)
    first[0] = True
    np.not_equal(a_sorted[1:], a_sorted[:-1], out=first[1:])
    s_sorted = np.where(first, a_sorted, np.int64(-1))
    leftovers = np.setdiff1d(np.arange(n_table, dtype=np.int64), a_sorted[first])
    holes = np.nonzero(~first)[0]
    fill = np.zeros(len(holes), dtype=np.int64)
    fill[: len(leftovers)] = leftovers
    s_sorted[holes] = fill
    return a_sorted, s_sorted


def _device_hbm_bytes() -> float:
    """Accelerator memory budget, preferring what the DEVICE reports over any
    env default (round-3 driver regression: a too-large default over-slabbed
    k=14 in an environment whose chip actually had 16 GB). Precedence:
    PAILLIER_TPU_HBM_GB env > device memory_stats > 8 GB default (see the
    comment below on why the default sits well under the 15.75 GB capacity)."""
    env = os.environ.get("PAILLIER_TPU_HBM_GB")
    if env is not None:
        return float(env) * (1 << 30)
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit and limit > (1 << 30):
            return float(limit)
    except Exception:
        pass
    # Conservative default: the chip's real capacity is 15.75 GB (from the
    # remote compiler's OOM report), but the budget must also absorb
    # resident polys, allocator fragmentation, and async-enqueue pileup that
    # the per-phase formulas do not model — 12 GB budgets OOM'd the k=17
    # B=16 run twice; the run that completed it used this 8 GB default
    # further tightened to PAILLIER_TPU_HBM_GB=5 for margin. Override
    # per-run when tuning.
    return 8.0 * (1 << 30)


def _slab_sizes(n_ext: int) -> tuple[int, int]:
    """Column-slab widths for the prover's wide phases, sized from the actual
    HBM footprint instead of fixed constants. The k=17/~50-column config-4
    run OOM'd un-slabbed (the batched extended NTT's transients peak at ~20x
    its input), but at k<=15 every phase fits whole — and slabbing there
    costs real time (k=14 warm proof: 23s un-slabbed vs 82s with the k=17
    slab constants). Overridable via PAILLIER_TPU_PERM_GROUP /
    PAILLIER_TPU_QUOT_GROUP.

    Both formulas carry a 0.7 headroom factor (ADVICE r3: the raw quotient
    divide left the extended-NTT transient alone at ~94% of HBM with resident
    polys unaccounted). Peaks they guard:
      - QG (quotient ext-NTT slab): ~20x transient inside one batched
        extended NTT of a (D, QG, n_ext) stack -> 20 * QG * col_ext_bytes.
      - GROUP (perm chunks per slab): binding phase is the quotient's perm
        constraints — per chunk ~8 live (D, 2, n_ext) arrays (col/id/sig
        ext forms, fs/fi, lhs/rhs, zp slice) = 16 * col_ext_bytes per chunk.
        (The base-domain grand-product phase peaks lower, ~8x over n-sized
        2-col chunks = 2 * col_ext_bytes per chunk.)"""
    col_ext_bytes = 32 * 4 * n_ext  # one column, extended domain, uint32 digits
    hbm = _device_hbm_bytes()
    qg = max(1, int(0.7 * hbm / (20 * col_ext_bytes)))
    group = max(1, int(0.7 * hbm / (16 * col_ext_bytes)))
    qg = int(os.environ.get("PAILLIER_TPU_QUOT_GROUP", qg))
    group = int(os.environ.get("PAILLIER_TPU_PERM_GROUP", group))
    return group, qg


import functools


@functools.lru_cache(maxsize=8)
def _omega_powers_dev(k: int) -> jnp.ndarray:
    """(D, 1, n) Montgomery powers of the 2^k-th root of unity, on device.
    Static per k; cached for the process lifetime (reused every proof)."""
    return ops.powers_dev([host.root_of_unity(k)], 1 << k)


@functools.lru_cache(maxsize=8)
def _delta_powers_digits(npc: int) -> np.ndarray:
    """(D, npc) Montgomery digits of DELTA^j (host; tiny)."""
    from .keygen import DELTA

    out, acc = [], 1
    for _ in range(npc):
        out.append(acc * SPEC.r_mod_p % P)
        acc = acc * DELTA % P
    return f.pack_ints(out)


@functools.lru_cache(maxsize=8)
def _zh_inv_dev(k: int, k_ext: int) -> jnp.ndarray:
    """1/Z_H on the extended coset (static per k; device, cached)."""
    n, n_ext = 1 << k, 1 << k_ext
    rate = n_ext // n
    g_coset = host.FR_GENERATOR
    gn = pow(g_coset, n, P)
    w_ext = host.root_of_unity(k_ext)
    zh_inv_pattern = []
    for i in range(rate):
        v = (gn * pow(w_ext, n * i % n_ext, P) - 1) % P
        zh_inv_pattern.append(pow(v, P - 2, P))
    return ops.to_device_mont(list(np.tile(np.array(zh_inv_pattern, dtype=object), n)))


@functools.partial(jax.jit, static_argnums=(0, 1))
def _fused_gates(k: int, k_ext: int, q_stack, a_stack, acc, ypow, ym):
    """Gate-constraint slab fused into ONE dispatch: extended-coset NTTs +
    q*(a + a(w)a(w2) - a(w3)) + y-Horner fold into acc. Single-chip path
    only (callers guard on no active mesh; inside jit the NTT router always
    takes the local device path)."""
    rate = 1 << (k_ext - k)
    q_ext = ops.extended_coset_evals(q_stack, k, k_ext)
    a_ext = ops.extended_coset_evals(a_stack, k, k_ext)
    rot = lambda e, s: jnp.roll(e, -s * rate, axis=-1)
    gate = f.add(SPEC, a_ext, f.mont_mul(SPEC, rot(a_ext, 1), rot(a_ext, 2)))
    gate = f.sub(SPEC, gate, rot(a_ext, 3))
    c = f.mont_mul(SPEC, q_ext, gate)
    fold = ops.sum_axis(f.mont_mul(SPEC, c, ypow), 1)
    return f.add(SPEC, f.mont_mul(SPEC, acc, ym), fold)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fused_perm_chunks(k: int, k_ext: int, pcs: int, col_stack, sig_stack,
                       id_vals, zslab_ext, act_ext, beta_m, gamma_m, one_m,
                       acc, ypow, ym):
    """Permutation chunk-update slab fused into ONE dispatch:
    active * [Z(wX) prod(col + b*sigma + g) - Z(X) prod(col + b*id + g)]
    with the column/sigma extended NTTs and the id iNTT+ext inside."""
    rate = 1 << (k_ext - k)
    col_e = ops.extended_coset_evals(col_stack, k, k_ext)
    sig_e = ops.extended_coset_evals(sig_stack, k, k_ext)
    id_e = ops.extended_coset_evals(ops.coeffs_of(id_vals, k), k, k_ext)
    b3 = beta_m[:, None, :]
    g3 = gamma_m[:, None, :]
    fs = f.add(SPEC, col_e, f.add(SPEC, f.mont_mul(SPEC, b3, sig_e), g3))
    fi = f.add(SPEC, col_e, f.add(SPEC, f.mont_mul(SPEC, b3, id_e), g3))
    if pcs:
        n_ext = col_e.shape[-1]
        ones_pad = jnp.broadcast_to(one_m[:, None, :], (32, pcs, n_ext))
        fs = jnp.concatenate([fs, ones_pad], axis=1)
        fi = jnp.concatenate([fi, ones_pad], axis=1)
    lhs = f.mont_mul(
        SPEC, jnp.roll(zslab_ext, -rate, axis=-1),
        f.mont_mul(SPEC, fs[:, 0::2], fs[:, 1::2]),
    )
    rhs = f.mont_mul(SPEC, zslab_ext, f.mont_mul(SPEC, fi[:, 0::2], fi[:, 1::2]))
    c = f.mont_mul(SPEC, act_ext[:, None], f.sub(SPEC, lhs, rhs))
    fold = ops.sum_axis(f.mont_mul(SPEC, c, ypow), 1)
    return f.add(SPEC, f.mont_mul(SPEC, acc, ym), fold)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _fused_lookups(k: int, k_ext: int, zl_slab_ext, lk_stack, ap_stack,
                   sp_stack, table_ext, l0_ext, lu_ext, act_ext, beta_m,
                   gamma_m, one_m, acc, ypow, ym):
    """Lookup constraint slab (a..e per column) fused into ONE dispatch."""
    rate = 1 << (k_ext - k)
    g = lk_stack.shape[1]
    n_ext = table_ext.shape[-1]
    lk_ext = ops.extended_coset_evals(lk_stack, k, k_ext)
    ap_ext = ops.extended_coset_evals(ap_stack, k, k_ext)
    sp_ext = ops.extended_coset_evals(sp_stack, k, k_ext)
    zl_ext = zl_slab_ext
    b3 = beta_m[:, None, :]
    g3 = gamma_m[:, None, :]
    one_ext = jnp.broadcast_to(one_m, (32, n_ext))
    rot = lambda e, s: jnp.roll(e, -s * rate, axis=-1)
    ca = f.mont_mul(SPEC, l0_ext[:, None], f.sub(SPEC, zl_ext, one_ext[:, None]))
    cb = f.mont_mul(SPEC, lu_ext[:, None], f.sub(SPEC, zl_ext, one_ext[:, None]))
    lhs_l = f.mont_mul(
        SPEC, rot(zl_ext, 1),
        f.mont_mul(SPEC, f.add(SPEC, ap_ext, b3), f.add(SPEC, sp_ext, g3)),
    )
    rhs_l = f.mont_mul(
        SPEC, zl_ext,
        f.mont_mul(SPEC, f.add(SPEC, lk_ext, b3), f.add(SPEC, table_ext[:, None], g3)),
    )
    cc = f.mont_mul(SPEC, act_ext[:, None], f.sub(SPEC, lhs_l, rhs_l))
    d1 = f.sub(SPEC, ap_ext, sp_ext)
    d2 = f.sub(SPEC, ap_ext, rot(ap_ext, -1))
    cd = f.mont_mul(SPEC, act_ext[:, None], f.mont_mul(SPEC, d1, d2))
    ce = f.mont_mul(SPEC, l0_ext[:, None], d1)
    cstack = jnp.stack([ca, cb, cc, cd, ce], axis=2).reshape(32, g * 5, n_ext)
    fold = ops.sum_axis(f.mont_mul(SPEC, cstack, ypow), 1)
    return f.add(SPEC, f.mont_mul(SPEC, acc, ym), fold)


class _Evaluator:
    """Single-point one-off evaluation helper (selfcheck paths only — the hot
    path batches every opening point through ops.powers_dev + one readback)."""

    def __init__(self, n: int):
        self.n = n
        self._powers: dict[int, jnp.ndarray] = {}

    def powers(self, x: int) -> jnp.ndarray:
        if x not in self._powers:
            self._powers[x] = ops.powers_dev([x], self.n)[:, 0]
        return self._powers[x]

    def eval(self, coeffs: jnp.ndarray, x: int) -> int:
        pw = self.powers(x)[:, : coeffs.shape[1]]
        return ops.from_device_mont(ops._sum_reduce(f.mont_mul(SPEC, coeffs, pw)))[0]


def _shplonk_open(pk, tr, opening_sets, all_evals, points, pw, pw_inv, zinvs,
                  fold_slabbed, syn_div_rows, n, na, nl, nzp, polys_by_kind):
    """SHPLONK (BDFG20) multi-open — see plonk/multiopen.py for the protocol
    and the grouping contract shared with the verifier. All poly arithmetic
    (group folds, chained synthetic divisions, the final L and Q quotients)
    runs on device from the precomputed opening-point power tables; only the
    tiny scalar plumbing (r_i(u) Lagrange over <=4 points, Z_T factors) is
    host math."""
    from .multiopen import KINDS, shplonk_groups

    vk = pk.vk
    npc = vk.n_perm_cols
    n_pieces = len(polys_by_kind["t"])
    groups = shplonk_groups(na, nl, npc, nzp, n_pieces)
    point_keys = [key for key, _ in opening_sets]
    si_of = {key: i for i, key in enumerate(point_keys)}

    emap: dict[tuple, int] = {}

    def fill(key, items):
        evs = all_evals[key]
        assert len(items) == len(evs), (key, len(items), len(evs))
        for it, e in zip(items, evs):
            emap[it + (key,)] = e

    fill("x", [(kind, i) for kind in KINDS for i in range(len(polys_by_kind[kind]))])
    fill(
        "wx",
        [("adv", i) for i in range(na)]
        + [("zp", i) for i in range(nzp)]
        + [("zl", i) for i in range(nl)],
    )
    fill("w2x", [("adv", i) for i in range(na)])
    fill("w3x", [("adv", i) for i in range(na)])
    fill("winvx", [("ap", i) for i in range(nl)])
    fill("wux", [("zp", i) for i in range(nzp - 1)] if nzp > 1 else [])

    y = tr.squeeze_challenge()
    v = tr.squeeze_challenge()

    F_list, r_evals = [], []
    h_acc = None
    G = len(groups)
    for gi, (pts, items) in enumerate(groups):
        m = len(items)
        ypow = jnp.asarray(
            f.pack_ints([pow(y, m - 1 - j, P) * SPEC.r_mod_p % P for j in range(m)])
        )[:, :, None]
        Fg = fold_slabbed([polys_by_kind[kind][i] for kind, i in items], ypow)
        F_list.append(Fg)
        re = {}
        for pt in pts:
            acc = 0
            for kind, i in items:
                acc = (acc * y + emap[(kind, i, pt)]) % P
            re[pt] = acc
        r_evals.append(re)
        hg = Fg
        for pt in pts:  # chained subtract-eval-and-divide == (F - r_i)/Z_S
            si = si_of[pt]
            hg = syn_div_rows(hg, pw[:, si], pw_inv[:, si], zinvs[si])
        vm = jnp.asarray(f.pack_ints([pow(v, G - 1 - gi, P) * SPEC.r_mod_p % P]))
        term = f.mont_mul(SPEC, hg, vm)
        h_acc = term if h_acc is None else f.add(SPEC, h_acc, term)
    (h_pt,) = commit_many(pk.srs, [h_acc])
    tr.write_point(h_pt)
    u = tr.squeeze_challenge()

    # host scalars: Z_T(u), z_i = Z_{T \ S_i}(u), r_i(u), c = sum a_i r_i(u)
    used = set()
    for pts, _ in groups:
        used.update(pts)
    T = [key for key in point_keys if key in used]
    z_t = 1
    for key in T:
        z_t = z_t * (u - points[key]) % P
    a_list, c = [], 0
    for gi, (pts, items) in enumerate(groups):
        zi = 1
        for key in T:
            if key not in pts:
                zi = zi * (u - points[key]) % P
        riu = 0
        for pt in pts:  # Lagrange interpolation of the folded evals at u
            zt = points[pt]
            num, den = 1, 1
            for qt in pts:
                if qt == pt:
                    continue
                num = num * (u - points[qt]) % P
                den = den * (zt - points[qt]) % P
            riu = (riu + r_evals[gi][pt] * num % P * pow(den, P - 2, P)) % P
        a = pow(v, G - 1 - gi, P) * zi % P
        a_list.append(a)
        c = (c + a * riu) % P

    coefs = jnp.asarray(
        f.pack_ints(
            [a * SPEC.r_mod_p % P for a in a_list]
            + [(P - z_t) % P * SPEC.r_mod_p % P]
        )
    )[:, :, None]
    big_l = fold_slabbed(F_list + [h_acc], coefs)
    c_m = jnp.asarray(f.pack_ints([c * SPEC.r_mod_p % P]))
    big_l = jnp.concatenate([f.sub(SPEC, big_l[:, :1], c_m), big_l[:, 1:]], axis=1)
    if _selfcheck():
        lu = ops.eval_at(big_l, u)
        print(f"[selfcheck] shplonk L(u) == 0: {lu == 0}", flush=True)
        assert lu == 0, "shplonk L(u) != 0"
    u_inv = pow(u, P - 2, P)
    pwu = ops.powers_dev([u, u_inv], n)
    q_poly = syn_div_rows(big_l, pwu[:, 0], pwu[:, 1], u_inv)
    (q_pt,) = commit_many(pk.srs, [q_poly])
    tr.write_point(q_pt)


def create_proof(
    pk: ProvingKey, table: VirtualTable, blinding_seed: bytes | None = None
) -> bytes:
    """blinding_seed=None (the default) draws fresh randomness (os.urandom) so
    proofs are actually zero-knowledge; pass an explicit seed only for
    determinism tests / fixtures."""
    from ..utils.trace import PhaseTimer, profile_section

    if blinding_seed is None:
        blinding_seed = os.urandom(32)
    _timer = PhaseTimer("prover")
    _mark = _timer.mark
    with profile_section("create_proof"):
        return _create_proof_inner(pk, table, blinding_seed, _mark)


def _create_proof_inner(
    pk: ProvingKey, table: VirtualTable, blinding_seed: bytes, _mark
) -> bytes:

    vk = pk.vk
    k, n, usable = vk.k, vk.n, vk.usable
    k_ext = k + EXTENDED_RATE_BITS
    rate = 1 << EXTENDED_RATE_BITS
    n_ext = n << EXTENDED_RATE_BITS
    na, nl = vk.num_advice, vk.num_lookup_advice
    layout = pk.layout
    tr = TranscriptWriter()
    for c in vk.fixed_commitments():
        tr.common_point(c)
    # public inputs bind the statement: absorbed (not written — the verifier
    # supplies them independently and absorbs the same values)
    public_vals = table.public_values() if vk.num_instance else []
    for v in public_vals:
        tr.common_scalar(v)

    # ---- 1. advice + lookup-advice columns --------------------------------
    adv_vals = witness_columns(table, layout, blinding_seed)
    lk_vals = lookup_columns(table, layout)
    for i in range(nl):
        lk_vals[i] = _blind_tail(lk_vals[i], usable, blinding_seed, b"lk%d" % i)

    # One batched iNTT over every column of the phase (middle axis = column).
    col_stack = ops.coeffs_of(
        ops.to_device_mont(np.concatenate([adv_vals, lk_vals]) if nl else adv_vals), k
    )
    adv_coeffs = [col_stack[:, c] for c in range(na)]
    lk_coeffs = [col_stack[:, na + i] for i in range(nl)]
    for pt in commit_many(pk.srs, adv_coeffs + lk_coeffs):
        tr.write_point(pt)

    _mark("advice committed")
    # ---- 2. permuted lookup pairs -----------------------------------------
    ap_vals, sp_vals = [], []
    for i in range(nl):
        a_s, s_s = _permuted_lookup(lk_vals[i][:usable], vk.lookup_bits, usable)
        apv = np.zeros(n, dtype=object)
        spv = np.zeros(n, dtype=object)
        apv[:usable] = a_s.astype(object)
        spv[:usable] = s_s.astype(object)
        ap_vals.append(_blind_tail(apv, usable, blinding_seed, b"ap%d" % i))
        sp_vals.append(_blind_tail(spv, usable, blinding_seed, b"sp%d" % i))
    if nl:
        asp_stack = ops.coeffs_of(ops.to_device_mont(np.stack(ap_vals + sp_vals)), k)
        ap_coeffs = [asp_stack[:, i] for i in range(nl)]
        sp_coeffs = [asp_stack[:, nl + i] for i in range(nl)]
    else:
        ap_coeffs, sp_coeffs = [], []
    for pt in commit_many(pk.srs, ap_coeffs + sp_coeffs):
        tr.write_point(pt)

    _mark("permuted lookups committed")
    beta = tr.squeeze_challenge()
    gamma = tr.squeeze_challenge()
    beta_m = ops.fr_digits_mont(beta).reshape(-1, 1)
    gamma_m = ops.fr_digits_mont(gamma).reshape(-1, 1)
    one_m = jnp.asarray(f.pack_ints([SPEC.r_mod_p]))

    # ---- 3. permutation grand products ------------------------------------
    # Permutation column j's value column: advice j (j<na), lookup advice
    # (na<=j<na+nl), fixed const (j = na+nl). All chunks batched: fractions,
    # inverses, prefix products, AND the chunk-chain starts run on device —
    # round 4 removed the per-slab host round trips (the id/sigma/column
    # re-uploads were the warm prover's single largest cost: 254-bit object
    # ints take pack_values' slow path, and the transfers ride the tunnel).
    # Column values are recomputed on device via values_of(coeffs) — the NTT
    # roundtrip is exact — and the id columns from a delta x omega outer
    # product.
    if vk.num_instance:
        from .layout import instance_column

        inst_coeffs = ops.coeffs_of(
            ops.to_device_mont(instance_column(table, pk.layout)), k
        )

    def perm_col_coeffs(j: int) -> jnp.ndarray:
        if j < na:
            return adv_coeffs[j]
        if j < na + nl:
            return lk_coeffs[j - na]
        if j == na + nl:
            return pk.fixed_const_coeffs
        return inst_coeffs  # instance column (public inputs)

    npc = vk.n_perm_cols
    active_mask = np.zeros(n, dtype=bool)
    active_mask[:usable] = True
    act_dev = jnp.asarray(active_mask)
    b3 = beta_m[:, None, :]
    g3 = gamma_m[:, None, :]
    omega_row = _omega_powers_dev(k)  # (D, 1, n) cached per k
    delta_all = _delta_powers_digits(npc)  # host digits, cached per npc

    def id_cols_dev(cols: list[int]) -> jnp.ndarray:
        dcol = jnp.asarray(delta_all[:, cols])[:, :, None]  # (D, g, 1)
        return f.mont_mul(SPEC, dcol, omega_row)

    def sigma_cols_dev(cols: list[int]) -> jnp.ndarray:
        return ops.values_of(
            jnp.stack([pk.sigma_coeffs[j] for j in cols], axis=1), k
        )

    # Processed in slabs of PERM_GROUP chunks: materializing every
    # permutation column's numerator/denominator/inverse at once peaks at
    # ~8x the resident column data and OOM'd HBM at k=17 with ~50 advice
    # columns (round-3 config-4 run). The per-chunk grand products are
    # independent except for the chain starts, so slab transients cap
    # memory while values (and transcript bytes) stay identical.
    n_chunks = len(vk.perm_chunks)
    GROUP, QG = _slab_sizes(n_ext)
    _mark("perm inputs packed")
    pref_slabs = []
    ends_dev: list[jnp.ndarray] = []
    for c0 in range(0, n_chunks, GROUP):
        c1 = min(c0 + GROUP, n_chunks)
        cols = list(range(2 * c0, min(2 * c1, npc)))
        pcd = ops.values_of(jnp.stack([perm_col_coeffs(j) for j in cols], axis=1), k)
        idd = id_cols_dev(cols)
        sgd = sigma_cols_dev(cols)
        num_f = f.add(SPEC, pcd, f.add(SPEC, f.mont_mul(SPEC, b3, idd), g3))
        den_f = f.add(SPEC, pcd, f.add(SPEC, f.mont_mul(SPEC, b3, sgd), g3))
        pc = (c1 - c0) * 2 - len(cols)  # pad to even chunks (PERM_CHUNK=2)
        if pc:
            pad_ones = jnp.broadcast_to(one_m[:, None, :], (32, pc, n))
            num_f = jnp.concatenate([num_f, pad_ones], axis=1)
            den_f = jnp.concatenate([den_f, pad_ones], axis=1)
        num_c = f.mont_mul(SPEC, num_f[:, 0::2], num_f[:, 1::2])  # (D, C, n)
        den_c = f.mont_mul(SPEC, den_f[:, 0::2], den_f[:, 1::2])
        frac = f.mont_mul(SPEC, num_c, ops.batch_inverse(den_c))
        frac = jnp.where(
            act_dev[None, None, :], frac, jnp.broadcast_to(one_m[:, None, :], frac.shape)
        )
        pref = ops.prefix_product(frac)  # (D, C, n) inclusive along rows
        pref_slabs.append(pref)
        ends_dev.append(pref[:, :, usable - 1])
    # chain starts on device: starts[c] = prod_{c'<c} ends[c'] (exclusive
    # prefix product along the chunk axis; tiny — C lanes)
    ends_all = jnp.concatenate(ends_dev, axis=1) if len(ends_dev) > 1 else ends_dev[0]
    pp_ends = ops.prefix_product(ends_all)  # (D, C) inclusive
    starts_dev = jnp.concatenate(
        [jnp.broadcast_to(one_m[:, :1], (32, 1)), pp_ends[:, :-1]], axis=1
    )
    if _closing_check():
        closing = ops.from_device_mont(pp_ends[:, -1:])[0]
        assert closing == 1, (
            "permutation product does not close (copy constraints unsatisfied?)"
        )
    zp_blind = np.empty((n_chunks, n - usable - 1), dtype=object)
    for c in range(n_chunks):
        for r in range(usable + 1, n):
            h = hashlib.blake2b(blinding_seed + b"zp%d" % c + r.to_bytes(4, "little")).digest()
            zp_blind[c, r - usable - 1] = int.from_bytes(h, "little") % P
    zp_blind_dev = ops.to_device_mont(zp_blind)
    zp_parts = []
    for si, c0 in enumerate(range(0, n_chunks, GROUP)):
        c1 = min(c0 + GROUP, n_chunks)
        pref = pref_slabs[si]
        start_m = starts_dev[:, c0:c1, None]
        shifted = jnp.concatenate(
            [jnp.broadcast_to(one_m[:, None, :], (32, c1 - c0, 1)), pref[:, :, :-1]],
            axis=2,
        )
        z_slab = f.mont_mul(SPEC, shifted, start_m)  # z[c, usable] = end_c*start_c
        z_slab = z_slab.at[:, :, usable + 1 :].set(zp_blind_dev[:, c0:c1])
        zp_parts.append(ops.coeffs_of(z_slab, k))
    # free the grand-product value-form temporaries before the HBM-peak
    # quotient phase (pref_slabs alone is C base-domain columns)
    del pref_slabs, ends_dev, ends_all, pp_ends, zp_blind_dev
    _mark("perm Z computed")

    zp_stack = zp_parts[0] if len(zp_parts) == 1 else jnp.concatenate(zp_parts, axis=1)
    zp_coeffs = [zp_stack[:, c] for c in range(n_chunks)]

    # ---- 4. lookup grand products (batched over lookup columns) -----------
    if getattr(pk, "_table_mont_dev", None) is None:
        pk._table_mont_dev = ops.to_device_mont(pk.table_values)
    table_dev = pk._table_mont_dev
    if nl:
        # value forms recomputed on device from the coefficient stacks (exact
        # NTT roundtrip) — no host re-upload of the big object-int arrays
        ap_dev = ops.values_of(jnp.stack(ap_coeffs, axis=1), k)
        sp_dev = ops.values_of(jnp.stack(sp_coeffs, axis=1), k)
        lk_dev = ops.values_of(jnp.stack(lk_coeffs, axis=1), k)
        num_l = f.mont_mul(SPEC, f.add(SPEC, lk_dev, b3), f.add(SPEC, table_dev[:, None, :], g3))
        den_l = f.mont_mul(SPEC, f.add(SPEC, ap_dev, b3), f.add(SPEC, sp_dev, g3))
        frac_l = f.mont_mul(SPEC, num_l, ops.batch_inverse(den_l))
        frac_l = jnp.where(
            act_dev[None, None, :], frac_l, jnp.broadcast_to(one_m[:, None, :], frac_l.shape)
        )
        pref_l = ops.prefix_product(frac_l)
        if _closing_check():
            ends_l = ops.from_device_mont(pref_l[:, :, usable - 1 : usable])
            assert all(e == 1 for e in ends_l), "lookup product does not close (lookup unsatisfied?)"
        shifted_l = jnp.concatenate(
            [jnp.broadcast_to(one_m[:, None, :], (32, nl, 1)), pref_l[:, :, :-1]], axis=2
        )
        zl_blind = np.empty((nl, n - usable - 1), dtype=object)
        for i in range(nl):
            for r in range(usable + 1, n):
                h = hashlib.blake2b(blinding_seed + b"zl%d" % i + r.to_bytes(4, "little")).digest()
                zl_blind[i, r - usable - 1] = int.from_bytes(h, "little") % P
        zl_all = shifted_l.at[:, :, usable + 1 :].set(ops.to_device_mont(zl_blind))
        zl_stack = ops.coeffs_of(zl_all, k)
        zl_coeffs = [zl_stack[:, i] for i in range(nl)]
        # free the value-form lookup temporaries: locals stay referenced to
        # the end of the function otherwise, holding ~6 (D, nl, n) arrays
        # through the HBM-peak quotient phase
        del num_l, den_l, frac_l, pref_l, shifted_l, zl_all, ap_dev, sp_dev, lk_dev
    else:
        zl_coeffs = []

    for pt in commit_many(pk.srs, zp_coeffs + zl_coeffs):
        tr.write_point(pt)

    _mark("grand products committed")
    y = tr.squeeze_challenge()
    y_m = ops.fr_digits_mont(y).reshape(-1, 1)
    _mark("y squeezed")

    # ---- 5. quotient on the extended coset --------------------------------
    # Constraint groups are batched: each group is ONE batched extended-coset
    # NTT over a (D, group, n) stack and one fused y-Horner fold
    # (sum_i C_i * y^{m-1-i} via a tree-sum), preserving the exact emission
    # order of the docstring / verifier.
    def ext(coeffs):
        """Extended-coset evals; multi-column stacks run through the NTT in
        slabs — the batched 2^(k+2) NTT's transients peak at ~20x the data
        (the 16-enc k=17 run requested 38 GB for one (D, 28, n_ext) call),
        while the RESULTS are modest. Values are identical."""
        if coeffs.ndim == 2 or coeffs.shape[1] <= QG:
            return ops.extended_coset_evals(coeffs, k, k_ext)
        parts = [
            ops.extended_coset_evals(coeffs[:, c0 : c0 + QG], k, k_ext)
            for c0 in range(0, coeffs.shape[1], QG)
        ]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    def rot(e, s):
        return jnp.roll(e, -s * rate, axis=-1)

    acc = jnp.zeros((32, n_ext), jnp.uint32)

    def emit_many(cstack):
        """cstack: (D, m, n_ext), constraint index ascending in emission order."""
        nonlocal acc
        m = cstack.shape[1]
        ypow = jnp.asarray(
            f.pack_ints([pow(y, m - 1 - i, P) * SPEC.r_mod_p % P for i in range(m)])
        )[:, :, None]
        fold = ops.sum_axis(f.mont_mul(SPEC, cstack, ypow), 1)
        ym = jnp.asarray(f.pack_ints([pow(y, m, P) * SPEC.r_mod_p % P]))
        acc = f.add(SPEC, f.mont_mul(SPEC, acc, ym), fold)

    # Single-chip ACCELERATOR slabs run FUSED (one jit dispatch per slab:
    # NTTs + constraint + y-fold — the eager chain's per-op dispatch
    # overheads were ~half the warm quotient phase over the tunnel).
    # Mesh-routed proving keeps the eager chain so the four-step NTT's
    # collectives stay outside jit tracing; CPU keeps it because three more
    # big XLA:CPU graphs cost more compile than they save (override
    # PAILLIER_TPU_FUSED_QUOTIENT=1/0 — tests pin fused==eager bytes).
    env_fused = os.environ.get("PAILLIER_TPU_FUSED_QUOTIENT")
    if env_fused is not None:
        fused = env_fused == "1" and ops._ACTIVE_MESH is None
    else:
        fused = (
            ops._ACTIVE_MESH is None and jax.devices()[0].platform != "cpu"
        )

    def ypow_ym(m):
        ypow = jnp.asarray(
            f.pack_ints([pow(y, m - 1 - i, P) * SPEC.r_mod_p % P for i in range(m)])
        )[:, :, None]
        ym = jnp.asarray(f.pack_ints([pow(y, m, P) * SPEC.r_mod_p % P]))
        return ypow, ym

    # Fused graphs contain SEVERAL batched extended NTTs whose ~20x
    # transients XLA does not serialize against each other (the k=17 B=16
    # run OOM'd in the fused gates phase with the eager-budget slabs), so
    # fused slab widths divide by the NTT count per graph.
    QG_F = max(1, QG // 2)  # _fused_gates: q + a extended NTTs
    GROUP_F = max(1, GROUP // 3)  # _fused_perm_chunks: col + sig + id
    # 1. gates: q_c * (a + a(w) a(w2) - a(w3)) for every advice column.
    # Sliced into column slabs: the whole-width (D, na, n_ext) stacks peak
    # at several GB at k=17 with ~50 columns (round-3 config-4 OOM); the
    # per-column constraint is column-local and emit_many is
    # order-preserving across sequential calls, so slabs change nothing.
    for a0 in range(0, na, QG_F if fused else QG):
        a1 = min(a0 + (QG_F if fused else QG), na)
        if fused:
            ypow, ym = ypow_ym(a1 - a0)
            acc = _fused_gates(
                k, k_ext,
                jnp.stack(pk.q_coeffs[a0:a1], axis=1),
                jnp.stack(adv_coeffs[a0:a1], axis=1),
                acc, ypow, ym,
            )
            continue
        q_ext = ext(jnp.stack(pk.q_coeffs[a0:a1], axis=1))  # (D, g, n_ext)
        a_ext = ext(jnp.stack(adv_coeffs[a0:a1], axis=1))
        gate = f.add(SPEC, a_ext, f.mont_mul(SPEC, rot(a_ext, 1), rot(a_ext, 2)))
        gate = f.sub(SPEC, gate, rot(a_ext, 3))
        emit_many(f.mont_mul(SPEC, q_ext, gate))
        del q_ext, a_ext, gate

    _mark("gate constraints emitted")
    l0_ext = ext(pk.l0_coeffs)
    lu_ext = ext(pk.lu_coeffs)
    act_ext = ext(pk.active_coeffs)
    one_ext = jnp.broadcast_to(one_m, (32, n_ext))
    b3 = beta_m[:, None, :]
    g3 = gamma_m[:, None, :]

    # Z-poly extended evals are recomputed PER SLAB (one cheap NTT each)
    # instead of holding the whole (D, C, n_ext) stack resident — at 27
    # chunks that stack alone is 1.8 GB of HBM through the peak phase.
    def zp_ext_slab(c0: int, c1: int) -> jnp.ndarray:
        return ops.extended_coset_evals(zp_stack[:, c0:c1], k, k_ext)

    # 2. l_0 * (Z_0 - 1)
    emit_many(
        f.mont_mul(SPEC, l0_ext, f.sub(SPEC, zp_ext_slab(0, 1)[:, 0], one_ext))[:, None]
    )
    # 3. chunk updates: active * [Z(wX) prod(col+b*sig+g) - Z prod(col+b*id+g)]
    # — same chunk slabs as phase 3 above (whole-width n_ext stacks OOM).
    for c0 in range(0, n_chunks, GROUP_F if fused else GROUP):
        c1 = min(c0 + (GROUP_F if fused else GROUP), n_chunks)
        cols = list(range(2 * c0, min(2 * c1, npc)))
        pcs = (c1 - c0) * 2 - len(cols)
        if fused:
            ypow, ym = ypow_ym(c1 - c0)
            acc = _fused_perm_chunks(
                k, k_ext, pcs,
                jnp.stack([perm_col_coeffs(j) for j in cols], axis=1),
                jnp.stack([pk.sigma_coeffs[j] for j in cols], axis=1),
                id_cols_dev(cols),
                zp_ext_slab(c0, c1), act_ext, beta_m, gamma_m, one_m,
                acc, ypow, ym,
            )
            continue
        col_e = ext(jnp.stack([perm_col_coeffs(j) for j in cols], axis=1))
        id_e = ext(ops.coeffs_of(id_cols_dev(cols), k))
        sig_e = ext(jnp.stack([pk.sigma_coeffs[j] for j in cols], axis=1))
        fs = f.add(SPEC, col_e, f.add(SPEC, f.mont_mul(SPEC, b3, sig_e), g3))
        fi = f.add(SPEC, col_e, f.add(SPEC, f.mont_mul(SPEC, b3, id_e), g3))
        del col_e, sig_e, id_e
        if pcs:  # pad odd column count with multiplicative-identity factors
            ones_pad = jnp.broadcast_to(one_m[:, None, :], (32, pcs, n_ext))
            fs = jnp.concatenate([fs, ones_pad], axis=1)
            fi = jnp.concatenate([fi, ones_pad], axis=1)
        zslab = zp_ext_slab(c0, c1)
        lhs = f.mont_mul(SPEC, rot(zslab, 1), f.mont_mul(SPEC, fs[:, 0::2], fs[:, 1::2]))
        rhs = f.mont_mul(SPEC, zslab, f.mont_mul(SPEC, fi[:, 0::2], fi[:, 1::2]))
        emit_many(f.mont_mul(SPEC, act_ext[:, None], f.sub(SPEC, lhs, rhs)))
        del fs, fi, lhs, rhs
    # 4. chains: l_0 * (Z_i - Z_{i-1}(w^u X)) — slabbed like (3); each chain
    # term only touches adjacent chunks
    for c0 in range(0, n_chunks - 1, GROUP):
        c1 = min(c0 + GROUP, n_chunks - 1)
        zslab_w = zp_ext_slab(c0, c1 + 1)  # chunks c0..c1 inclusive
        chain = f.sub(SPEC, zslab_w[:, 1:], rot(zslab_w[:, :-1], usable))
        emit_many(f.mont_mul(SPEC, l0_ext[:, None], chain))
        del chain, zslab_w
    # 5. closing: l_u * (Z_last - 1)
    emit_many(
        f.mont_mul(
            SPEC, lu_ext,
            f.sub(SPEC, zp_ext_slab(n_chunks - 1, n_chunks)[:, 0], one_ext),
        )[:, None]
    )

    _mark("perm constraints emitted")
    # 6. lookups: per column, constraints (a..e) in order, columns outermost
    # — slabbed over lookup columns (5 constraints per column; emission
    # order within and across emit_many calls is unchanged)
    if nl:
        table_ext = ext(pk.table_coeffs)
        # 3 extended NTTs (lk/ap/sp) inside the fused graph + 5 constraint
        # rows per column either way
        LG = max(1, QG // 12) if fused else max(1, QG // 4)
        for i0 in range(0, nl, LG):
            i1 = min(i0 + LG, nl)
            if fused:
                ypow, ym = ypow_ym((i1 - i0) * 5)
                acc = _fused_lookups(
                    k, k_ext,
                    ext(zl_stack[:, i0:i1]),
                    jnp.stack(lk_coeffs[i0:i1], axis=1),
                    jnp.stack(ap_coeffs[i0:i1], axis=1),
                    jnp.stack(sp_coeffs[i0:i1], axis=1),
                    table_ext, l0_ext, lu_ext, act_ext, beta_m, gamma_m,
                    one_m, acc, ypow, ym,
                )
                continue
            zl_ext = ext(zl_stack[:, i0:i1])  # (D, g, n_ext)
            lk_ext = ext(jnp.stack(lk_coeffs[i0:i1], axis=1))
            ap_ext = ext(jnp.stack(ap_coeffs[i0:i1], axis=1))
            sp_ext = ext(jnp.stack(sp_coeffs[i0:i1], axis=1))
            ca = f.mont_mul(SPEC, l0_ext[:, None], f.sub(SPEC, zl_ext, one_ext[:, None]))
            cb = f.mont_mul(SPEC, lu_ext[:, None], f.sub(SPEC, zl_ext, one_ext[:, None]))
            lhs_l = f.mont_mul(
                SPEC,
                rot(zl_ext, 1),
                f.mont_mul(SPEC, f.add(SPEC, ap_ext, b3), f.add(SPEC, sp_ext, g3)),
            )
            rhs_l = f.mont_mul(
                SPEC,
                zl_ext,
                f.mont_mul(
                    SPEC, f.add(SPEC, lk_ext, b3), f.add(SPEC, table_ext[:, None], g3)
                ),
            )
            cc = f.mont_mul(SPEC, act_ext[:, None], f.sub(SPEC, lhs_l, rhs_l))
            d1 = f.sub(SPEC, ap_ext, sp_ext)
            d2 = f.sub(SPEC, ap_ext, rot(ap_ext, -1))
            cd = f.mont_mul(SPEC, act_ext[:, None], f.mont_mul(SPEC, d1, d2))
            ce = f.mont_mul(SPEC, l0_ext[:, None], d1)
            lk_stack5 = jnp.stack([ca, cb, cc, cd, ce], axis=2)  # (D, g, 5, n_ext)
            emit_many(lk_stack5.reshape(32, (i1 - i0) * 5, n_ext))
            del zl_ext, lk_ext, ap_ext, sp_ext, ca, cb, cc, cd, ce, lk_stack5
        del table_ext

    # divide by Z_H on the coset (static per k -> process-cached on device)
    t_ext = f.mont_mul(SPEC, acc, _zh_inv_dev(k, k_ext))
    _mark("quotient divided")
    t_coeffs = ops.coeffs_from_extended(t_ext, k, k_ext)
    n_pieces = 3  # max constraint degree 4 -> deg(t) <= 3n - 4
    if _selfcheck():
        tail = ops.from_device_mont(t_coeffs[:, n_pieces * n :])
        n_bad = sum(1 for v in tail if v != 0)
        print(
            f"[selfcheck] t degree tail: {n_bad}/{len(tail)} nonzero coeffs past "
            f"{n_pieces}n {'** DEGREE OVERFLOW **' if n_bad else '(ok)'}",
            flush=True,
        )
        if n_bad:
            raise AssertionError(
                f"quotient degree overflow: {n_bad} nonzero t(X) coefficients "
                f"past {n_pieces}*n — a constraint exceeds the assumed degree "
                f"bound (soundness bug); raise n_pieces"
            )
    t_pieces = [t_coeffs[:, i * n : (i + 1) * n] for i in range(n_pieces)]
    for pt in commit_many(pk.srs, t_pieces):
        tr.write_point(pt)

    _mark("quotient committed")
    x = tr.squeeze_challenge()
    w1 = host.root_of_unity(k)
    points = {
        "x": x,
        "wx": x * w1 % P,
        "w2x": x * pow(w1, 2, P) % P,
        "w3x": x * pow(w1, 3, P) % P,
        "winvx": x * pow(w1, P - 2, P) % P,
        "wux": x * pow(w1, usable, P) % P,
    }

    # opening registry: (point_key, list of coeff arrays) in canonical order
    nz = len(vk.perm_chunks)
    at_x = (
        adv_coeffs
        + lk_coeffs
        + pk.q_coeffs
        + [pk.fixed_const_coeffs, pk.table_coeffs]
        + pk.sigma_coeffs
        + zp_coeffs
        + zl_coeffs
        + ap_coeffs
        + sp_coeffs
        + t_pieces
    )
    at_wx = adv_coeffs + zp_coeffs + zl_coeffs
    at_w2x = adv_coeffs
    at_w3x = adv_coeffs
    at_winvx = ap_coeffs
    at_wux = zp_coeffs[:-1] if nz > 1 else []
    opening_sets = [
        ("x", at_x),
        ("wx", at_wx),
        ("w2x", at_w2x),
        ("w3x", at_w3x),
        ("winvx", at_winvx),
        ("wux", at_wux),
    ]

    # ---- evals: every (point, poly) pair batched on device, ONE readback --
    # Power tables for all opening points (and their inverses, for the
    # batched synthetic division below) are computed on device: two tiny h2d
    # + log-depth prefix products instead of 6 host power loops + transfers.
    point_keys = [key for key, _ in opening_sets]
    zs = [points[key] for key in point_keys]
    zinvs = [pow(z, P - 2, P) for z in zs]
    pw = ops.powers_dev(zs, n)  # (D, 6, n)
    pw_inv = ops.powers_dev(zinvs, n)
    EV_SLAB = int(os.environ.get("PAILLIER_TPU_EVAL_SLAB", str(max(4 * QG, 8))))
    ev_parts = []
    n_enqueued = 0
    for si, (key, polys) in enumerate(opening_sets):
        row = pw[:, si : si + 1, :]
        for c0 in range(0, len(polys), EV_SLAB):
            stacked = jnp.stack(list(polys[c0 : c0 + EV_SLAB]), axis=1)
            ev_parts.append(
                ops._sum_reduce(f.mont_mul(SPEC, stacked, row))[..., 0]
            )
            # backpressure: async enqueues each hold a slab-sized stack +
            # product transient; unbounded pileup OOM'd HBM at k=17 (the
            # d2h below materializes everything at once otherwise)
            n_enqueued += 1
            if n_enqueued % 3 == 0:
                jax.block_until_ready(ev_parts[-1])
    all_ev_flat = (
        ops.from_device_mont(jnp.concatenate(ev_parts, axis=1)) if ev_parts else []
    )
    all_evals: dict[str, list[int]] = {}
    pos = 0
    for key, polys in opening_sets:
        evs = all_ev_flat[pos : pos + len(polys)]
        pos += len(polys)
        all_evals[key] = evs
        for e in evs:
            tr.write_scalar(e)

    _mark("evals written")

    def fold_slabbed(polys, coefs_mont):
        """sum_j coefs[j] * polys[j] on device, slabbed (coefs packed
        (D,m,1)); blocks per slab past the first (HBM backpressure — see the
        eval loop above)."""
        acc_c = None
        for c0 in range(0, len(polys), EV_SLAB):
            part = ops.sum_axis(
                f.mont_mul(
                    SPEC,
                    jnp.stack(list(polys[c0 : c0 + EV_SLAB]), axis=1),
                    coefs_mont[:, c0 : c0 + EV_SLAB],
                ),
                1,
            )
            acc_c = part if acc_c is None else f.add(SPEC, acc_c, part)
            if c0 > 0:
                jax.block_until_ready(acc_c)
        return acc_c

    zeros1 = jnp.zeros((32, 1), jnp.uint32)

    def syn_div_rows(arr, zrow, zinvrow, zinv: int):
        """(f(X) - f(z)) / (X - z) on device from precomputed power rows."""
        d = f.mont_mul(SPEC, arr, zrow)
        incl = ops._suffix_sum(d)
        s = jnp.concatenate([incl[:, 1:], zeros1], axis=1)
        zim = jnp.asarray(f.pack_ints([zinv * SPEC.r_mod_p % P]))
        return f.mont_mul(SPEC, f.mont_mul(SPEC, s, zinvrow), zim)

    if vk.multiopen == "shplonk":
        _shplonk_open(
            pk, tr, opening_sets, all_evals, points, pw, pw_inv, zinvs,
            fold_slabbed, syn_div_rows, n, na, nl, nz,
            {
                "adv": adv_coeffs, "lk": lk_coeffs, "q": pk.q_coeffs,
                "fc": [pk.fixed_const_coeffs], "table": [pk.table_coeffs],
                "sigma": pk.sigma_coeffs, "zp": zp_coeffs, "zl": zl_coeffs,
                "ap": ap_coeffs, "sp": sp_coeffs, "t": t_pieces,
            },
        )
        _mark("multiopen done")
        return tr.finalize()

    # ---- 6. GWC multi-open (legacy; PAILLIER_TPU_MULTIOPEN=gwc) -----------
    # nu-fold per opening set (slabbed), then ALL W quotients in one batched
    # synthetic division: q_i = z^-(i+1) * suffix_sum(c_j z^j)_{i+1}, using
    # the device power tables above — no host power loops, no per-set
    # division dispatch chains.
    nu = tr.squeeze_challenge()
    ev = _Evaluator(n) if _selfcheck() else None
    acc_list, acc_rows = [], []
    for si, (key, polys) in enumerate(opening_sets):
        if not polys:
            continue
        m = len(polys)
        nupow = jnp.asarray(
            f.pack_ints([pow(nu, m - 1 - i, P) * SPEC.r_mod_p % P for i in range(m)])
        )[:, :, None]
        acc_c = None
        for c0 in range(0, m, EV_SLAB):
            part = ops.sum_axis(
                f.mont_mul(
                    SPEC,
                    jnp.stack(list(polys[c0 : c0 + EV_SLAB]), axis=1),
                    nupow[:, c0 : c0 + EV_SLAB],
                ),
                1,
            )
            acc_c = part if acc_c is None else f.add(SPEC, acc_c, part)
        if ev is not None:
            z = points[key]
            fz = ev.eval(acc_c, z)
            v_fold = 0
            for e in all_evals[key]:
                v_fold = (v_fold * nu + e) % P
            w_q = ops.synthetic_divide(acc_c, z)
            xi = 0x1234567 % P
            lhs = (ev.eval(acc_c, xi) - fz) * pow(xi - z, P - 2, P) % P
            rhs = ev.eval(w_q, xi)
            print(
                f"[selfcheck] open@{key}: fold==f(z): {fz == v_fold}; "
                f"division identity: {lhs == rhs}",
                flush=True,
            )
            assert fz == v_fold and lhs == rhs, f"multiopen selfcheck failed @{key}"
        acc_list.append(acc_c)
        acc_rows.append(si)
    acc_stack = jnp.stack(acc_list, axis=1)  # (D, nw, n)
    zinv_m = jnp.asarray(
        f.pack_ints([zinvs[si] * SPEC.r_mod_p % P for si in acc_rows])
    )[:, :, None]
    d = f.mont_mul(SPEC, acc_stack, pw[:, acc_rows])
    incl = ops._suffix_sum(d)
    s = jnp.concatenate(
        [incl[..., 1:], jnp.zeros((32, len(acc_rows), 1), jnp.uint32)], axis=-1
    )
    wq_stack = f.mont_mul(SPEC, f.mont_mul(SPEC, s, pw_inv[:, acc_rows]), zinv_m)
    w_list = [wq_stack[:, i] for i in range(len(acc_rows))]
    for pt in commit_many(pk.srs, w_list):
        tr.write_point(pt)

    _mark("multiopen done")
    return tr.finalize()
