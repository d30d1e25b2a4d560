"""Fiat-Shamir transcript — blake2b, halo2-shaped framing
(SURVEY.md section 2.2, "Transcript"; halo2-axiom's Blake2bWrite/Blake2bRead).

Framing follows halo2's Blake2bTranscript conventions:
- state: blake2b(64-byte digest) initialized with a domain-prefix personal tag
- absorbing a G1 point: common_point -> write x, y coordinates as 32-byte LE
  field elements (infinity is an error, as in halo2)
- absorbing a scalar: common_scalar -> 32-byte LE
- squeezing a challenge: hash state with a challenge-domain byte, digest
  becomes new state seed; challenge = digest interpreted LE mod r
  (halo2 uses Challenge255 with from_uniform_bytes on 64 bytes)
- the proof byte stream contains each prover-written point/scalar in the
  same encoding, so verifier replay is byte-exact.

Note on reference parity: the reference's proofs come from halo2-axiom's
Rust implementation; with no Rust toolchain in this environment, byte-level
cross-validation against it is not runnable here, so the framing is kept
protocol-shaped and self-consistent (prover/verifier replay bit-exactly, and
fixed seeds give deterministic transcripts across runs and mesh shapes).
"""
from __future__ import annotations

import hashlib

from ..ec.host import Point
from ..ff.host import FQ_MOD, FR_MOD

BLAKE2B_PREFIX_CHALLENGE = b"\x00"
BLAKE2B_PREFIX_POINT = b"\x01"
BLAKE2B_PREFIX_SCALAR = b"\x02"


def _fe_bytes(v: int) -> bytes:
    return int(v).to_bytes(32, "little")


class TranscriptWriter:
    """Prover side: absorbs commitments/evals, emits the proof byte stream."""

    def __init__(self) -> None:
        self._state = hashlib.blake2b(person=b"Halo2-Transcript")
        self._proof = bytearray()

    # -- absorb only (no proof bytes): e.g. vk hash / instance commitments --

    def common_point(self, p: Point) -> None:
        if p is None:
            raise ValueError("cannot absorb the point at infinity")
        self._state.update(BLAKE2B_PREFIX_POINT)
        self._state.update(_fe_bytes(p[0]))
        self._state.update(_fe_bytes(p[1]))

    def common_scalar(self, s: int) -> None:
        self._state.update(BLAKE2B_PREFIX_SCALAR)
        self._state.update(_fe_bytes(s % FR_MOD))

    # -- write: absorb + append to proof ------------------------------------

    def write_point(self, p: Point) -> None:
        self.common_point(p)
        self._proof += _fe_bytes(p[0]) + _fe_bytes(p[1])

    def write_scalar(self, s: int) -> None:
        self.common_scalar(s)
        self._proof += _fe_bytes(s % FR_MOD)

    def squeeze_challenge(self) -> int:
        self._state.update(BLAKE2B_PREFIX_CHALLENGE)
        digest = self._state.digest()
        self._state = hashlib.blake2b(person=b"Halo2-Transcript")
        self._state.update(digest)
        return int.from_bytes(digest, "little") % FR_MOD

    def finalize(self) -> bytes:
        return bytes(self._proof)


class TranscriptReader:
    """Verifier side: replays the byte stream, re-deriving identical challenges."""

    def __init__(self, proof: bytes) -> None:
        self._state = hashlib.blake2b(person=b"Halo2-Transcript")
        self._buf = memoryview(proof)
        self._pos = 0

    def common_point(self, p: Point) -> None:
        if p is None:
            raise ValueError("cannot absorb the point at infinity")
        self._state.update(BLAKE2B_PREFIX_POINT)
        self._state.update(_fe_bytes(p[0]))
        self._state.update(_fe_bytes(p[1]))

    def common_scalar(self, s: int) -> None:
        self._state.update(BLAKE2B_PREFIX_SCALAR)
        self._state.update(_fe_bytes(s % FR_MOD))

    def _take(self, n: int) -> bytes:
        if self._pos + n > len(self._buf):
            raise ValueError("transcript exhausted")
        out = bytes(self._buf[self._pos : self._pos + n])
        self._pos += n
        return out

    def read_point(self) -> Point:
        x = int.from_bytes(self._take(32), "little")
        y = int.from_bytes(self._take(32), "little")
        if x >= FQ_MOD or y >= FQ_MOD:
            raise ValueError("point coordinate out of range")
        p = (x, y)
        from ..ec.host import g1_is_on_curve

        if not g1_is_on_curve(p):
            raise ValueError("transcript point not on curve")
        self.common_point(p)
        return p

    def read_scalar(self) -> int:
        s = int.from_bytes(self._take(32), "little")
        if s >= FR_MOD:
            raise ValueError("scalar out of range")
        self.common_scalar(s)
        return s

    def squeeze_challenge(self) -> int:
        self._state.update(BLAKE2B_PREFIX_CHALLENGE)
        digest = self._state.digest()
        self._state = hashlib.blake2b(person=b"Halo2-Transcript")
        self._state.update(digest)
        return int.from_bytes(digest, "little") % FR_MOD

    def assert_consumed(self) -> None:
        if self._pos != len(self._buf):
            raise ValueError("trailing bytes in proof")
