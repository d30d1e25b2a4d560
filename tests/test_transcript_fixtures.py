"""Transcript encoding fixtures (BASELINE config 3, VERDICT round-1 item 8).

Pins the halo2-shaped proof encoding byte-for-byte so a framing regression
can't ship silently, and so parity vs halo2-axiom's Rust output is testable
offline later: when a Rust toolchain is available, generate the same vectors
with halo2curves/halo2-axiom and diff against these constants.

Conventions pinned here:
- compressed G1: 32-byte LE x, bit 7 of byte 31 = y parity, identity = zeros
- blake2b-64 state, personal b"Halo2-Transcript"
- point absorb: 0x01 || x(32 LE) || y(32 LE); scalar absorb: 0x02 || s(32 LE)
- squeeze: absorb 0x00, finalize a CLONE (state keeps running),
  challenge = digest(64) LE mod r
"""
import hashlib
import random

import pytest

from paillier_halo2_tpu.ec import host as ech
from paillier_halo2_tpu.ff.host import FQ_MOD
from paillier_halo2_tpu.plonk.transcript import (
    TranscriptReader,
    TranscriptWriter,
    point_from_bytes,
    point_to_bytes,
)

POINT_VECTORS = [
    (0x1, "0100000000000000000000000000000000000000000000000000000000000000"),
    (0x2, "d3cf876dc108c2d3a81c8716a91678d9851518685b04859b021a132ee7440603"),
    (0x3, "f0ab15199655d3f279e6b81547d8159315bdb6b1bc3202f43fea6bc59abf6987"),
    (0xDEADBEEF, "0338a14ed70bc42447eda3cff1e2439f30d97c6556f8b4f092c89f6c9cbfd99f"),
    (
        (1 << 200) + 12345,
        "84fa03c0fcd2558edbf3e5e191db3357c307c0f094a62ef745a6d97bff8357b0",
    ),
]

C1 = 0x20D269DB2B1889B60EDDF31B14549D395D240CE6B2C950FE519660303B4BD56
C2 = 0x144CC3BDD06E3FDE5241024086D45BD03B9A7D81E047D0000C9CC51870A04313
PROOF_HEX = (
    "0100000000000000000000000000000000000000000000000000000000000000"
    "d3cf876dc108c2d3a81c8716a91678d9851518685b04859b021a132ee7440603"
    "f0ab15199655d3f279e6b81547d8159315bdb6b1bc3202f43fea6bc59abf6987"
    "0338a14ed70bc42447eda3cff1e2439f30d97c6556f8b4f092c89f6c9cbfd99f"
    "84fa03c0fcd2558edbf3e5e191db3357c307c0f094a62ef745a6d97bff8357b0"
    "efcdab8967452301000000000000000000000000000000000000000000000000"
)


def test_point_compression_fixtures():
    for k, hexenc in POINT_VECTORS:
        p = ech.g1_mul(ech.G1, k)
        enc = point_to_bytes(p)
        assert enc.hex() == hexenc, f"encoding drifted for [{k}]G1"
        assert point_from_bytes(enc) == p
        assert len(enc) == 32


def test_point_compression_roundtrip_random():
    rng = random.Random(5150)
    for _ in range(32):
        p = ech.g1_mul(ech.G1, rng.randrange(1, ech.R))
        assert point_from_bytes(point_to_bytes(p)) == p
    assert point_to_bytes(None) == bytes(32)
    assert point_from_bytes(bytes(32)) is None


def test_point_decompress_rejects_bad():
    # x not on curve (x=1+? -> rhs non-QR for some x): find one deterministically
    x = 5
    while True:
        rhs = (pow(x, 3, FQ_MOD) + 3) % FQ_MOD
        if pow(rhs, (FQ_MOD - 1) // 2, FQ_MOD) != 1:
            break
        x += 1
    raw = bytearray(int(x).to_bytes(32, "little"))
    with pytest.raises(ValueError):
        point_from_bytes(bytes(raw))
    # x >= q
    raw = bytearray(int(FQ_MOD).to_bytes(32, "little"))
    with pytest.raises(ValueError):
        point_from_bytes(bytes(raw))


def test_transcript_fixture_stream():
    pts = [ech.g1_mul(ech.G1, k) for k, _ in POINT_VECTORS]
    tr = TranscriptWriter()
    for p in pts:
        tr.write_point(p)
    assert tr.squeeze_challenge() == C1
    tr.write_scalar(0x123456789ABCDEF)
    assert tr.squeeze_challenge() == C2
    proof = tr.finalize()
    assert proof.hex() == PROOF_HEX

    rd = TranscriptReader(proof)
    got_pts = [rd.read_point() for _ in pts]
    assert got_pts == pts
    assert rd.squeeze_challenge() == C1
    assert rd.read_scalar() == 0x123456789ABCDEF
    assert rd.squeeze_challenge() == C2
    rd.assert_consumed()


def test_squeeze_keeps_state_running():
    """halo2 semantics: the squeeze finalizes a CLONE; the running state keeps
    absorbing, so challenge(n+1) depends on everything before challenge(n)
    plus the prefix byte, not on a reset seed."""
    t1 = TranscriptWriter()
    t1.write_scalar(7)
    a = t1.squeeze_challenge()
    b = t1.squeeze_challenge()
    # manual replay with raw blake2b
    h = hashlib.blake2b(digest_size=64, person=b"Halo2-Transcript")
    h.update(b"\x02" + int(7).to_bytes(32, "little"))
    h.update(b"\x00")
    assert a == int.from_bytes(h.copy().digest(), "little") % ech.R
    h.update(b"\x00")
    assert b == int.from_bytes(h.copy().digest(), "little") % ech.R
