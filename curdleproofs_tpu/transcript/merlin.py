"""Merlin transcripts over STROBE-128.

Behavioural spec: the Rust `merlin` crate v1.0 framing —
  append_message(label, msg): meta_AD(label) || meta_AD(len_le32, more) || AD(msg)
  challenge_bytes(label, n):  meta_AD(label) || meta_AD(len_le32, more) || PRF(n)

Reference parity: merlin_transcripts/merlin_transcripts/merlin_transcript.py:6-24.
"""
from __future__ import annotations

from curdleproofs_tpu.transcript.strobe import Strobe128

MERLIN_PROTOCOL_LABEL = b"Merlin v1.0"


class MerlinTranscript:
    __slots__ = ("strobe",)

    def __init__(self, label: bytes) -> None:
        self.strobe = Strobe128(MERLIN_PROTOCOL_LABEL)
        self.append_message(b"dom-sep", label)

    def append_message(self, label: bytes, message: bytes) -> None:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(len(message).to_bytes(4, "little"), True)
        self.strobe.ad(message, False)

    def append_u64(self, label: bytes, x: int) -> None:
        self.append_message(label, x.to_bytes(8, "little"))

    def challenge_bytes(self, label: bytes, n: int) -> bytes:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(n.to_bytes(4, "little"), True)
        return bytes(self.strobe.prf(n, False))
