"""ctypes bindings for the native BN254 host engine (native/bn254.cpp).

Builds the shared library on first use with g++ (cached next to the source,
keyed by a source hash) and exposes g1_add / g1_mul / g1_msm / pairing_check
mirroring ec/host.py and ec/pairing.py signatures. Import never fails: if no
compiler is available the `lib()` accessor returns None and callers fall back
to the pure-Python host path.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bn254.cpp")

_lib = None
_tried = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.blake2b(f.read(), digest_size=8).hexdigest()
    so = os.path.join(_DIR, f"_bn254_{tag}.so")
    if os.path.exists(so):
        return so
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so + ".tmp", _SRC],
            check=True,
            capture_output=True,
            timeout=300,
        )
        os.replace(so + ".tmp", so)
        return so
    except Exception:
        return None


def lib():
    """Initialized ctypes library handle, or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("PAILLIER_TPU_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        L = ctypes.CDLL(so)
    except OSError:
        return None

    from ..ff.host import FQ_MOD as Q

    L.fp_ctx_init.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.c_uint64,
    ]
    L.g1_add_c.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
    ]
    L.g1_mul_c.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
    ]
    L.g1_msm_c.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
    ]
    L.pairing_check_c.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    L.pairing_check_c.restype = ctypes.c_int
    L.fr_ctx_init.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint64]
    L.fr_ntt_c.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64,
        ctypes.c_uint64,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
    ]

    from ..ff.host import FR_MOD as R

    fr_r2 = (1 << 512) % R
    fr_ninv = (-pow(R, -1, 1 << 64)) % (1 << 64)
    L.fr_ctx_init(R.to_bytes(32, "little"), fr_r2.to_bytes(32, "little"), fr_ninv)

    r2 = (1 << 512) % Q
    ninv = (-pow(Q, -1, 1 << 64)) % (1 << 64)
    ate_loop = 6 * 4965661367192848881 + 2
    L.fp_ctx_init(
        Q.to_bytes(32, "little"),
        r2.to_bytes(32, "little"),
        ninv,
        ate_loop & ((1 << 64) - 1),
        ate_loop >> 64,
    )
    _lib = L
    return _lib


def _enc_g1(p) -> tuple[bytes, int]:
    if p is None:
        return b"\x00" * 64, 1
    return p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little"), 0


def _dec_g1(buf, inf):
    if inf.value:
        return None
    b = bytes(buf)
    return (int.from_bytes(b[:32], "little"), int.from_bytes(b[32:], "little"))


def g1_add(p, q):
    L = lib()
    pb, pi = _enc_g1(p)
    qb, qi = _enc_g1(q)
    out = ctypes.create_string_buffer(64)
    oinf = ctypes.c_int()
    L.g1_add_c(pb, pi, qb, qi, out, ctypes.byref(oinf))
    return _dec_g1(out.raw, oinf)


def g1_mul(p, k: int):
    L = lib()
    pb, pi = _enc_g1(p)
    if k == 0 or pi:
        return None
    kb = int(k).to_bytes((k.bit_length() + 7) // 8, "little")
    out = ctypes.create_string_buffer(64)
    oinf = ctypes.c_int()
    L.g1_mul_c(pb, pi, kb, len(kb), out, ctypes.byref(oinf))
    return _dec_g1(out.raw, oinf)


def fr_ntt(data, k: int, inverse: bool) -> None:
    """In-place radix-2 NTT over Fr on a C-contiguous (batch, n, 32) uint8
    numpy array of little-endian Montgomery-form elements (n = 2^k). Mirrors
    poly/ntt.py `ntt` (in-order DIT, inverse includes the 1/n scale)."""
    import numpy as np

    from ..ff.host import FR_MOD, root_of_unity

    L = lib()
    assert L is not None, "native library unavailable"
    assert data.dtype == np.uint8 and data.flags["C_CONTIGUOUS"]
    n = 1 << k
    assert data.shape[-2:] == (n, 32)
    batch = data.size // (n * 32)
    w = root_of_unity(k) if k else 1
    scale = b"\x00" * 32
    if inverse:
        w = pow(w, FR_MOD - 2, FR_MOD)
        scale = pow(n, FR_MOD - 2, FR_MOD).to_bytes(32, "little")
    L.fr_ntt_c(
        data.ctypes.data_as(ctypes.c_void_p),
        n,
        batch,
        w.to_bytes(32, "little"),
        scale,
        1 if inverse else 0,
    )


def g1_msm_raw(pts: bytes, infs: bytes, scalars: bytes, n: int):
    """MSM over pre-encoded buffers: pts = n*64 bytes of little-endian affine
    (x, y), infs = n bytes, scalars = n*32 bytes little-endian. Avoids the
    per-point Python encode of `g1_msm` for callers that cache the base
    encoding (the KZG CPU commit backend encodes the SRS once)."""
    L = lib()
    out = ctypes.create_string_buffer(64)
    oinf = ctypes.c_int()
    L.g1_msm_c(pts, infs, scalars, n, out, ctypes.byref(oinf))
    return _dec_g1(out.raw, oinf)


def g1_msm(points, scalars):
    L = lib()
    n = len(points)
    pts = bytearray(64 * n)
    infs = bytearray(n)
    sc = bytearray(32 * n)
    for i, (p, s) in enumerate(zip(points, scalars)):
        b, inf = _enc_g1(p)
        pts[64 * i : 64 * (i + 1)] = b
        infs[i] = inf
        sc[32 * i : 32 * (i + 1)] = (int(s) % (1 << 256)).to_bytes(32, "little")
    out = ctypes.create_string_buffer(64)
    oinf = ctypes.c_int()
    L.g1_msm_c(bytes(pts), bytes(infs), bytes(sc), n, out, ctypes.byref(oinf))
    return _dec_g1(out.raw, oinf)


def pairing_check(pairs) -> bool:
    from ..ff.host import FQ_MOD as Q
    from ..ff.host import FR_MOD as R

    L = lib()
    n = len(pairs)
    g1s = bytearray(64 * n)
    g1infs = bytearray(n)
    g2s = bytearray(128 * n)
    g2infs = bytearray(n)
    for i, (p, q) in enumerate(pairs):
        b, inf = _enc_g1(p)
        g1s[64 * i : 64 * (i + 1)] = b
        g1infs[i] = inf
        if q is None:
            g2infs[i] = 1
        else:
            (xc0, xc1), (yc0, yc1) = q
            g2s[128 * i : 128 * i + 128] = (
                xc0.to_bytes(32, "little")
                + xc1.to_bytes(32, "little")
                + yc0.to_bytes(32, "little")
                + yc1.to_bytes(32, "little")
            )
    fe = (Q**12 - 1) // R
    feb = fe.to_bytes((fe.bit_length() + 7) // 8, "little")
    ok = L.pairing_check_c(
        bytes(g1s), bytes(g1infs), bytes(g2s), bytes(g2infs), n, feb, len(feb)
    )
    return bool(ok)
