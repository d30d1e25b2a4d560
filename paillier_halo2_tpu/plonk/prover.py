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


def _slab_sizes(n_ext: int) -> tuple[int, int]:
    """Column-slab widths for the prover's wide phases, sized from the actual
    HBM footprint instead of fixed constants. The k=17/~50-column config-4
    run OOM'd un-slabbed (the batched extended NTT's transients peak at ~20x
    its input; the perm fraction/inverse phase at ~8x), but at k<=15 every
    phase fits whole — and slabbing there costs real time (k=14 warm proof:
    23s un-slabbed vs 82s with the k=17 slab constants). Overridable via
    PAILLIER_TPU_PERM_GROUP / PAILLIER_TPU_QUOT_GROUP."""
    col_ext_bytes = 32 * 4 * n_ext  # one column, extended domain, uint32 digits
    hbm = float(os.environ.get("PAILLIER_TPU_HBM_GB", "12")) * (1 << 30)
    qg = max(1, int(hbm / (20 * col_ext_bytes)))
    group = max(1, int(0.7 * hbm / (16 * col_ext_bytes)))
    qg = int(os.environ.get("PAILLIER_TPU_QUOT_GROUP", qg))
    group = int(os.environ.get("PAILLIER_TPU_PERM_GROUP", group))
    return group, qg


class _Evaluator:
    """Caches device power vectors per opening point."""

    def __init__(self, n: int):
        self.n = n
        self._powers: dict[int, jnp.ndarray] = {}

    def powers(self, x: int) -> jnp.ndarray:
        if x not in self._powers:
            acc, out = 1, []
            for _ in range(self.n):
                out.append(acc)
                acc = acc * x % P
            self._powers[x] = ops.to_device_mont(out)
        return self._powers[x]

    def eval(self, coeffs: jnp.ndarray, x: int) -> int:
        pw = self.powers(x)[:, : coeffs.shape[1]]
        return ops.from_device_mont(ops._sum_reduce(f.mont_mul(SPEC, coeffs, pw)))[0]

    def eval_many(self, coeff_list: list[jnp.ndarray], x: int) -> list[int]:
        """All polys at one point in a single device call (equal widths)."""
        if not coeff_list:
            return []
        m = coeff_list[0].shape[1]
        assert all(c.shape[1] == m for c in coeff_list)
        stacked = jnp.stack(coeff_list, axis=1)  # (D, P, m)
        pw = self.powers(x)[:, None, :m]
        return ops.from_device_mont(ops._sum_reduce(f.mont_mul(SPEC, stacked, pw)))


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
    # inverses, and prefix products run over a (D, chunks, n) tensor; only
    # the chunk-chain starts (one scalar per chunk) touch the host.
    def perm_col_values(j: int) -> np.ndarray:
        if j < na:
            return adv_vals[j]
        if j < na + nl:
            return lk_vals[j - na]
        return pk.fixed_const_values

    npc = vk.n_perm_cols
    active_mask = np.zeros(n, dtype=bool)
    active_mask[:usable] = True
    act_dev = jnp.asarray(active_mask)
    b3 = beta_m[:, None, :]
    g3 = gamma_m[:, None, :]

    # Processed in slabs of PERM_GROUP chunks: materializing every
    # permutation column's numerator/denominator/inverse at once peaks at
    # ~8x the resident column data and OOM'd HBM at k=17 with ~50 advice
    # columns (round-3 config-4 run). The per-chunk grand products are
    # independent except for the scalar chain starts, so slab transients
    # cap memory while values (and transcript bytes) stay identical.
    n_chunks = len(vk.perm_chunks)
    GROUP, QG = _slab_sizes(n_ext)
    _mark("perm inputs packed")
    pref_slabs = []
    ends: list[int] = []
    for c0 in range(0, n_chunks, GROUP):
        c1 = min(c0 + GROUP, n_chunks)
        cols = list(range(2 * c0, min(2 * c1, npc)))
        pcd = ops.to_device_mont(np.stack([perm_col_values(j) for j in cols]))
        idd = ops.to_device_mont(pk.id_values[cols])
        sgd = ops.to_device_mont(pk.sigma_values[cols])
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
        ends.extend(ops.from_device_mont(pref[:, :, usable - 1 : usable]))
    starts = [1]
    for e in ends:
        starts.append(starts[-1] * e % P)
    assert starts[-1] == 1, "permutation product does not close (copy constraints unsatisfied?)"
    zp_blind = np.empty((n_chunks, n - usable - 1), dtype=object)
    for c in range(n_chunks):
        for r in range(usable + 1, n):
            h = hashlib.blake2b(blinding_seed + b"zp%d" % c + r.to_bytes(4, "little")).digest()
            zp_blind[c, r - usable - 1] = int.from_bytes(h, "little") % P
    zp_parts = []
    for si, c0 in enumerate(range(0, n_chunks, GROUP)):
        c1 = min(c0 + GROUP, n_chunks)
        pref = pref_slabs[si]
        start_m = jnp.asarray(
            f.pack_ints([s * SPEC.r_mod_p % P for s in starts[c0:c1]])
        )[:, :, None]
        shifted = jnp.concatenate(
            [jnp.broadcast_to(one_m[:, None, :], (32, c1 - c0, 1)), pref[:, :, :-1]],
            axis=2,
        )
        z_slab = f.mont_mul(SPEC, shifted, start_m)  # z[c, usable] = end_c*start_c
        z_slab = z_slab.at[:, :, usable + 1 :].set(
            ops.to_device_mont(zp_blind[c0:c1])
        )
        zp_parts.append(ops.coeffs_of(z_slab, k))
    _mark("perm Z computed")

    zp_stack = zp_parts[0] if len(zp_parts) == 1 else jnp.concatenate(zp_parts, axis=1)
    zp_coeffs = [zp_stack[:, c] for c in range(n_chunks)]

    # ---- 4. lookup grand products (batched over lookup columns) -----------
    table_dev = ops.to_device_mont(pk.table_values)
    if nl:
        ap_dev = ops.to_device_mont(np.stack(ap_vals))
        sp_dev = ops.to_device_mont(np.stack(sp_vals))
        lk_dev = ops.to_device_mont(np.stack(lk_vals))
        num_l = f.mont_mul(SPEC, f.add(SPEC, lk_dev, b3), f.add(SPEC, table_dev[:, None, :], g3))
        den_l = f.mont_mul(SPEC, f.add(SPEC, ap_dev, b3), f.add(SPEC, sp_dev, g3))
        frac_l = f.mont_mul(SPEC, num_l, ops.batch_inverse(den_l))
        frac_l = jnp.where(
            act_dev[None, None, :], frac_l, jnp.broadcast_to(one_m[:, None, :], frac_l.shape)
        )
        pref_l = ops.prefix_product(frac_l)
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

    # 1. gates: q_c * (a + a(w) a(w2) - a(w3)) for every advice column.
    # Sliced into column slabs: the whole-width (D, na, n_ext) stacks peak
    # at several GB at k=17 with ~50 columns (round-3 config-4 OOM); the
    # per-column constraint is column-local and emit_many is
    # order-preserving across sequential calls, so slabs change nothing.
    for a0 in range(0, na, QG):
        a1 = min(a0 + QG, na)
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

    zp_ext = ext(zp_stack)  # (D, C, n_ext)
    # 2. l_0 * (Z_0 - 1)
    emit_many(f.mont_mul(SPEC, l0_ext, f.sub(SPEC, zp_ext[:, 0], one_ext))[:, None])
    # 3. chunk updates: active * [Z(wX) prod(col+b*sig+g) - Z prod(col+b*id+g)]
    # — same chunk slabs as phase 3 above (whole-width n_ext stacks OOM).
    for c0 in range(0, n_chunks, GROUP):
        c1 = min(c0 + GROUP, n_chunks)
        cols = list(range(2 * c0, min(2 * c1, npc)))
        col_e = ext(ops.coeffs_of(
            ops.to_device_mont(np.stack([perm_col_values(j) for j in cols])), k))
        id_e = ext(ops.coeffs_of(ops.to_device_mont(pk.id_values[cols]), k))
        sig_e = ext(jnp.stack([pk.sigma_coeffs[j] for j in cols], axis=1))
        fs = f.add(SPEC, col_e, f.add(SPEC, f.mont_mul(SPEC, b3, sig_e), g3))
        fi = f.add(SPEC, col_e, f.add(SPEC, f.mont_mul(SPEC, b3, id_e), g3))
        del col_e, sig_e, id_e
        pcs = (c1 - c0) * 2 - len(cols)
        if pcs:  # pad odd column count with multiplicative-identity factors
            ones_pad = jnp.broadcast_to(one_m[:, None, :], (32, pcs, n_ext))
            fs = jnp.concatenate([fs, ones_pad], axis=1)
            fi = jnp.concatenate([fi, ones_pad], axis=1)
        zslab = zp_ext[:, c0:c1]
        lhs = f.mont_mul(SPEC, rot(zslab, 1), f.mont_mul(SPEC, fs[:, 0::2], fs[:, 1::2]))
        rhs = f.mont_mul(SPEC, zslab, f.mont_mul(SPEC, fi[:, 0::2], fi[:, 1::2]))
        emit_many(f.mont_mul(SPEC, act_ext[:, None], f.sub(SPEC, lhs, rhs)))
        del fs, fi, lhs, rhs
    # 4. chains: l_0 * (Z_i - Z_{i-1}(w^u X)) — slabbed like (3); each chain
    # term only touches adjacent chunks
    for c0 in range(0, n_chunks - 1, GROUP):
        c1 = min(c0 + GROUP, n_chunks - 1)
        chain = f.sub(
            SPEC, zp_ext[:, c0 + 1 : c1 + 1], rot(zp_ext[:, c0:c1], usable)
        )
        emit_many(f.mont_mul(SPEC, l0_ext[:, None], chain))
        del chain
    # 5. closing: l_u * (Z_last - 1)
    emit_many(f.mont_mul(SPEC, lu_ext, f.sub(SPEC, zp_ext[:, -1], one_ext))[:, None])
    del zp_ext

    _mark("perm constraints emitted")
    # 6. lookups: per column, constraints (a..e) in order, columns outermost
    # — slabbed over lookup columns (5 constraints per column; emission
    # order within and across emit_many calls is unchanged)
    if nl:
        table_ext = ext(pk.table_coeffs)
        LG = max(1, QG // 4)
        for i0 in range(0, nl, LG):
            i1 = min(i0 + LG, nl)
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

    # divide by Z_H on the coset
    g_coset = host.FR_GENERATOR
    gn = pow(g_coset, n, P)
    w_ext = host.root_of_unity(k_ext)
    zh_inv_pattern = []
    for i in range(rate):
        v = (gn * pow(w_ext, n * i % n_ext, P) - 1) % P
        zh_inv_pattern.append(pow(v, P - 2, P))
    zh_inv = ops.to_device_mont(list(np.tile(np.array(zh_inv_pattern, dtype=object), n)))
    t_ext = f.mont_mul(SPEC, acc, zh_inv)
    _mark("quotient divided")
    t_coeffs = ops.coeffs_from_extended(t_ext, k, k_ext)
    n_pieces = 3  # max constraint degree 4 -> deg(t) <= 3n - 4
    if os.environ.get("PAILLIER_TPU_SELFCHECK"):
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

    ev = _Evaluator(n)
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

    all_evals: dict[str, list[int]] = {}
    for key, polys in opening_sets:
        evs = ev.eval_many(list(polys), points[key])
        all_evals[key] = evs
        for e in evs:
            tr.write_scalar(e)

    _mark("evals written")
    # ---- 6. GWC multi-open -------------------------------------------------
    nu = tr.squeeze_challenge()
    w_list = []
    for key, polys in opening_sets:
        if not polys:
            continue
        m = len(polys)
        nupow = jnp.asarray(
            f.pack_ints([pow(nu, m - 1 - i, P) * SPEC.r_mod_p % P for i in range(m)])
        )[:, :, None]
        acc_c = ops.sum_axis(
            f.mont_mul(SPEC, jnp.stack(list(polys), axis=1), nupow), 1
        )
        if os.environ.get("PAILLIER_TPU_SELFCHECK"):
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
        w_list.append(ops.synthetic_divide(acc_c, points[key]))
    for pt in commit_many(pk.srs, w_list):
        tr.write_point(pt)

    _mark("multiopen done")
    return tr.finalize()
