"""Tracker opening proof: Chaum-Pedersen discrete-log-equality Sigma-protocol.

Proves knowledge of k with k_G = k*G and k_r_G = k*r_G. 128-byte proof
(2 points + 1 scalar). Reference parity: opening.py:22-106 (labels
tracker_opening_proof / tracker_opening_proof_challenge).
"""
from __future__ import annotations

from typing import Optional, Type, TypeVar

from curdleproofs_tpu.curve import G1, G1_GENERATOR
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.transcript.fiat_shamir import CurdleproofsTranscript
from curdleproofs_tpu.utils.errors import check
from curdleproofs_tpu.utils.rng import ProofRng, default_rng
from curdleproofs_tpu.utils.serde import (
    BufReader,
    fr_from_json,
    fr_to_bytes,
    fr_to_json,
    g1_from_json,
    g1_to_bytes,
    g1_to_json,
    points_to_transcript_bytes,
)

T_TOP = TypeVar("T_TOP", bound="TrackerOpeningProof")


class TrackerOpeningProof:
    def __init__(self, A: G1, B: G1, s: Fr) -> None:
        self.A = A
        self.B = B
        self.s = s

    @classmethod
    def new(
        cls: Type[T_TOP],
        k_r_G: G1,
        r_G: G1,
        k_G: G1,
        k: Fr,
        transcript: CurdleproofsTranscript,
        rng: Optional[ProofRng] = None,
    ) -> T_TOP:
        rng = rng or default_rng()
        blinder = rng.random_scalar()
        A = G1_GENERATOR * blinder
        B = r_G * blinder

        transcript.append_list(
            b"tracker_opening_proof",
            points_to_transcript_bytes([k_G, G1_GENERATOR, k_r_G, r_G, A, B]),
        )
        challenge = transcript.get_and_append_challenge(
            b"tracker_opening_proof_challenge"
        )
        return cls(A, B, blinder - challenge * k)

    def verify(
        self,
        transcript: CurdleproofsTranscript,
        k_r_G: G1,
        r_G: G1,
        k_G: G1,
    ) -> None:
        transcript.append_list(
            b"tracker_opening_proof",
            points_to_transcript_bytes([k_G, G1_GENERATOR, k_r_G, r_G, self.A, self.B]),
        )
        challenge = transcript.get_and_append_challenge(
            b"tracker_opening_proof_challenge"
        )
        A_prime = G1_GENERATOR * self.s + k_G * challenge
        B_prime = r_G * self.s + k_r_G * challenge
        check(
            A_prime == self.A and B_prime == self.B,
            "tracker opening proof check failed",
        )

    # -- serde (opening.py:93-106) ------------------------------------------

    def to_json(self):
        return {
            "A": g1_to_json(self.A),
            "B": g1_to_json(self.B),
            "s": fr_to_json(self.s),
        }

    @classmethod
    def from_json(cls: Type[T_TOP], data) -> T_TOP:
        return cls(
            g1_from_json(data["A"]), g1_from_json(data["B"]), fr_from_json(data["s"])
        )

    def to_bytes(self) -> bytes:
        return g1_to_bytes(self.A) + g1_to_bytes(self.B) + fr_to_bytes(self.s)

    @classmethod
    def from_bytes(cls: Type[T_TOP], b: BufReader) -> T_TOP:
        return cls(A=b.read_g1(), B=b.read_g1(), s=b.read_fr())
