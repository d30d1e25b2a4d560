"""Proving/verifying-key serialization — the checkpoint/resume subsystem
(SURVEY.md section 5): the reference persists only the KZG SRS cache
(/root/reference/.gitignore:4) and regenerates pk/vk per run; here keys are
additionally serializable so a long-lived prover service can skip keygen.

Format: a single ``.npz`` (no pickle). Arbitrary-precision values (object-int
arrays, curve points) are stored as packed 32x uint32 digit tensors via the
same little-endian digit convention as the device representation
(`poly.ops.pack_values`); device arrays round-trip through host numpy.
"""
from __future__ import annotations

import hashlib
import json

import jax.numpy as jnp
import numpy as np

from .params import ConfigParams
from ..poly import ops
from .keygen import ProvingKey, VerifyingKey
from .layout import CircuitLayout
from .srs import SRS

_POINT_NONE = (0, 0, 1)  # x, y, is_infinity


def table_fingerprint(table, k: int, lookup_bits: int) -> str:
    """Structural fingerprint of (circuit, k, lookup_bits) for pk-cache
    validation (ADVICE r4: a cached pk keyed by filename alone can go stale
    across layout-affecting code changes). Hashes everything keygen depends
    on — gate/copy/constant/lookup/public positions and the constant
    values — but NOT witness values, which vary per statement without
    affecting the key. Bump the `v` prefix on any layout-semantics change."""
    h = hashlib.blake2b(digest_size=16)
    h.update(f"v1|{k}|{lookup_bits}|{table.n_rows}|".encode())
    for arr in (
        table.gates,
        table.copy_a,
        table.copy_b,
        table.const_idx,
        table.lookups,
        table.publics,
    ):
        h.update(np.ascontiguousarray(arr, dtype=np.int64).tobytes())
    h.update(ops.pack_values(table.const_val).tobytes())
    return h.hexdigest()


def _points_pack(points) -> np.ndarray:
    """List of affine points ((x, y) ints or None) -> (m, 3, 32) uint32."""
    rows = []
    for p in points:
        x, y, inf = _POINT_NONE if p is None else (p[0], p[1], 0)
        rows.append(np.stack([ops.pack_values([x])[:, 0], ops.pack_values([y])[:, 0],
                              np.full(32, inf, dtype=np.uint32)]))
    return np.stack(rows) if rows else np.zeros((0, 3, 32), dtype=np.uint32)


def _points_unpack(arr: np.ndarray):
    out = []
    for row in arr:
        if int(row[2, 0]):
            out.append(None)
        else:
            x = ops.unpack_values(row[0].reshape(32, 1))[0]
            y = ops.unpack_values(row[1].reshape(32, 1))[0]
            out.append((x, y))
    return out


def _obj_pack(a: np.ndarray) -> np.ndarray:
    return ops.pack_values(a)


def _obj_unpack(d: np.ndarray) -> np.ndarray:
    shape = d.shape[1:]
    vals = ops.unpack_values(d.reshape(32, -1))
    return np.array(vals, dtype=object).reshape(shape)


def save_proving_key(pk: ProvingKey, path: str, table_fp: str | None = None) -> None:
    vk, layout = pk.vk, pk.layout
    meta = {
        "table_fp": table_fp,
        "k": vk.k,
        "lookup_bits": vk.lookup_bits,
        "num_advice": vk.num_advice,
        "num_lookup_advice": vk.num_lookup_advice,
        "n_perm_cols": vk.n_perm_cols,
        "perm_chunks": vk.perm_chunks,
        "usable": vk.usable,
        "multiopen": vk.multiopen,
        "num_instance": vk.num_instance,
        "layout_n": layout.n,
        "n_virtual": layout.n_virtual,
        "config": vars(layout.config),
        "srs_k": pk.srs.k,
    }
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        q_commits=_points_pack(vk.q_commits),
        fixed_commits=_points_pack([vk.fixed_const_commit, vk.table_commit]),
        sigma_commits=_points_pack(vk.sigma_commits),
        q_coeffs=np.stack([np.asarray(c) for c in pk.q_coeffs]),
        fixed_const_coeffs=np.asarray(pk.fixed_const_coeffs),
        table_coeffs=np.asarray(pk.table_coeffs),
        sigma_coeffs=np.stack([np.asarray(c) for c in pk.sigma_coeffs]),
        active_coeffs=np.asarray(pk.active_coeffs),
        l0_coeffs=np.asarray(pk.l0_coeffs),
        lu_coeffs=np.asarray(pk.lu_coeffs),
        id_values=_obj_pack(pk.id_values),
        sigma_values=_obj_pack(pk.sigma_values),
        table_values=_obj_pack(pk.table_values),
        fixed_const_values=_obj_pack(pk.fixed_const_values),
        layout_col_of=pk.layout.col_of,
        layout_row_of=pk.layout.row_of,
        layout_q=pk.layout.q,
        layout_fixed_const=_obj_pack(pk.layout.fixed_const),
        layout_sigma_col=pk.layout.sigma_col,
        layout_sigma_row=pk.layout.sigma_row,
        layout_lookup_src=pk.layout.lookup_src,
        layout_publics=pk.layout.publics,
    )


def load_proving_key(
    path: str, srs: SRS, expect_table_fp: str | None = None
) -> ProvingKey:
    """Load a serialized proving key. When ``expect_table_fp`` is given, the
    stored fingerprint must match (a key saved without one never matches) —
    raises ValueError otherwise, so callers fall back to fresh keygen instead
    of proving with a stale layout."""
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    assert srs.k >= meta["srs_k"], "SRS smaller than the one the key was built with"
    if expect_table_fp is not None and meta.get("table_fp") != expect_table_fp:
        raise ValueError(
            f"proving-key cache {path} fingerprint mismatch: "
            f"stored={meta.get('table_fp')} expected={expect_table_fp}"
        )
    fixed2 = _points_unpack(z["fixed_commits"])
    vk = VerifyingKey(
        k=meta["k"],
        lookup_bits=meta["lookup_bits"],
        num_advice=meta["num_advice"],
        num_lookup_advice=meta["num_lookup_advice"],
        n_perm_cols=meta["n_perm_cols"],
        perm_chunks=[list(c) for c in meta["perm_chunks"]],
        usable=meta["usable"],
        multiopen=meta.get("multiopen", "gwc"),  # legacy keys were GWC
        num_instance=meta.get("num_instance", 0),
        q_commits=_points_unpack(z["q_commits"]),
        fixed_const_commit=fixed2[0],
        table_commit=fixed2[1],
        sigma_commits=_points_unpack(z["sigma_commits"]),
    )
    layout = CircuitLayout(
        config=ConfigParams(**meta["config"]),
        n=meta["layout_n"],
        col_of=z["layout_col_of"],
        row_of=z["layout_row_of"],
        q=z["layout_q"],
        fixed_const=_obj_unpack(z["layout_fixed_const"]),
        sigma_col=z["layout_sigma_col"],
        sigma_row=z["layout_sigma_row"],
        lookup_src=z["layout_lookup_src"],
        n_virtual=meta["n_virtual"],
        publics=(
            z["layout_publics"]
            if "layout_publics" in getattr(z, "files", [])
            else np.zeros(0, dtype=np.int64)
        ),
    )
    return ProvingKey(
        vk=vk,
        layout=layout,
        srs=srs,
        q_coeffs=[jnp.asarray(c) for c in z["q_coeffs"]],
        fixed_const_coeffs=jnp.asarray(z["fixed_const_coeffs"]),
        table_coeffs=jnp.asarray(z["table_coeffs"]),
        sigma_coeffs=[jnp.asarray(c) for c in z["sigma_coeffs"]],
        active_coeffs=jnp.asarray(z["active_coeffs"]),
        l0_coeffs=jnp.asarray(z["l0_coeffs"]),
        lu_coeffs=jnp.asarray(z["lu_coeffs"]),
        id_values=_obj_unpack(z["id_values"]),
        sigma_values=_obj_unpack(z["sigma_values"]),
        table_values=_obj_unpack(z["table_values"]),
        fixed_const_values=_obj_unpack(z["fixed_const_values"]),
    )
