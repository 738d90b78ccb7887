"""Whisk consensus-facing API.

Byte-level interface used by Ethereum consensus-specs: trackers are pairs of
48-byte BLS pubkeys, proofs are flat byte strings, IsValid* wrap assert-style
verifiers into bools. Reference parity: whisk_interface.py:24-190 (same
transcript domains b"curdleproofs" / b"whisk_opening_proof", same layouts).
"""
from __future__ import annotations

from typing import List, NewType, Optional, Sequence, Tuple, Type, TypeVar

from curdleproofs_tpu.curve import G1, G1_GENERATOR
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.models.crs import CurdleproofsCrs
from curdleproofs_tpu.models.opening import TrackerOpeningProof
from curdleproofs_tpu.models.shuffle import (
    CurdleProofsProof,
    shuffle_permute_and_commit_input,
)
from curdleproofs_tpu.transcript.fiat_shamir import CurdleproofsTranscript
from curdleproofs_tpu.utils.rng import ProofRng, default_rng
from curdleproofs_tpu.utils.serde import BufReader, g1_from_json, g1_to_bytes, g1_to_json

BLSPubkey = NewType("BLSPubkey", bytes)  # 48-byte compressed G1
WhiskShuffleProofBytes = bytes
SerializedWhiskTrackerProof = bytes


class WhiskTracker:
    __slots__ = ("r_G", "k_r_G")

    def __init__(self, r_G: BLSPubkey, k_r_G: BLSPubkey) -> None:
        self.r_G = r_G  # r * G
        self.k_r_G = k_r_G  # k * r * G


T_WSP = TypeVar("T_WSP", bound="WhiskShuffleProof")


class WhiskShuffleProof:
    def __init__(self, M: G1, proof: CurdleProofsProof) -> None:
        self.M = M
        self.proof = proof

    def to_json(self):
        return {"M": g1_to_json(self.M), "proof": self.proof.to_json()}

    @classmethod
    def from_json(cls: Type[T_WSP], data) -> T_WSP:
        return cls(
            M=g1_from_json(data["M"]), proof=CurdleProofsProof.from_json(data["proof"])
        )

    def to_bytes(self) -> bytes:
        return g1_to_bytes(self.M) + self.proof.to_bytes()

    @classmethod
    def from_bytes(cls: Type[T_WSP], b: BufReader, n: int) -> T_WSP:
        return cls(M=b.read_g1(), proof=CurdleProofsProof.from_bytes(b, n))


def _decode_tracker_points(trackers: Sequence[WhiskTracker]):
    vec_R = [G1.from_compressed_bytes_unchecked(t.r_G) for t in trackers]
    vec_S = [G1.from_compressed_bytes_unchecked(t.k_r_G) for t in trackers]
    return vec_R, vec_S


def IsValidWhiskShuffleProof(
    crs: CurdleproofsCrs,
    pre_shuffle_trackers: Sequence[WhiskTracker],
    post_shuffle_trackers: Sequence[WhiskTracker],
    whisk_shuffle_proof_bytes: WhiskShuffleProofBytes,
) -> bool:
    """Verify `post_shuffle_trackers` is a permutation of
    `pre_shuffle_trackers` (bool wrapper, reference whisk_interface.py:74-87).
    """
    try:
        AssertIsValidWhiskShuffleProof(
            crs, pre_shuffle_trackers, post_shuffle_trackers, whisk_shuffle_proof_bytes
        )
        return True
    except Exception:
        return False


def AssertIsValidWhiskShuffleProof(
    crs: CurdleproofsCrs,
    pre_shuffle_trackers: Sequence[WhiskTracker],
    post_shuffle_trackers: Sequence[WhiskTracker],
    whisk_shuffle_proof_bytes: WhiskShuffleProofBytes,
) -> None:
    vec_R, vec_S = _decode_tracker_points(pre_shuffle_trackers)
    vec_T, vec_U = _decode_tracker_points(post_shuffle_trackers)

    n = crs.ell + crs.n_blinders
    proof = WhiskShuffleProof.from_bytes(BufReader(whisk_shuffle_proof_bytes), n)
    proof.proof.verify(crs, vec_R, vec_S, vec_T, vec_U, proof.M)


def GenerateWhiskShuffleProof(
    crs: CurdleproofsCrs,
    pre_shuffle_trackers: Sequence[WhiskTracker],
    rng: Optional[ProofRng] = None,
) -> Tuple[List[WhiskTracker], WhiskShuffleProofBytes]:
    rng = rng or default_rng()
    permutation = rng.permutation(crs.ell)
    k = rng.random_scalar()

    vec_R, vec_S = _decode_tracker_points(pre_shuffle_trackers)
    vec_T, vec_U, M, vec_m_blinders = shuffle_permute_and_commit_input(
        crs, vec_R, vec_S, permutation, k, rng
    )

    proof = CurdleProofsProof.new(
        crs=crs,
        vec_R=vec_R,
        vec_S=vec_S,
        vec_T=vec_T,
        vec_U=vec_U,
        M=M,
        permutation=permutation,
        k=k,
        vec_m_blinders=vec_m_blinders,
        rng=rng,
    )
    whisk_shuffle_proof = WhiskShuffleProof(M, proof)

    post_trackers = [
        WhiskTracker(BLSPubkey(g1_to_bytes(t)), BLSPubkey(g1_to_bytes(u)))
        for t, u in zip(vec_T, vec_U)
    ]
    return post_trackers, whisk_shuffle_proof.to_bytes()


def IsValidWhiskOpeningProof(
    tracker: WhiskTracker,
    k_commitment: BLSPubkey,
    tracker_proof: SerializedWhiskTrackerProof,
) -> bool:
    """Verify knowledge of k with tracker.k_r_G == k * tracker.r_G and
    k_commitment == k * G (bool wrapper, whisk_interface.py:146-158)."""
    try:
        AssertIsValidWhiskOpeningProof(tracker, k_commitment, tracker_proof)
        return True
    except Exception:
        return False


def AssertIsValidWhiskOpeningProof(
    tracker: WhiskTracker,
    k_commitment: BLSPubkey,
    tracker_proof: SerializedWhiskTrackerProof,
) -> None:
    proof = TrackerOpeningProof.from_bytes(BufReader(tracker_proof))
    transcript = CurdleproofsTranscript(b"whisk_opening_proof")
    proof.verify(
        transcript,
        G1.from_compressed_bytes_unchecked(tracker.k_r_G),
        G1.from_compressed_bytes_unchecked(tracker.r_G),
        G1.from_compressed_bytes_unchecked(k_commitment),
    )


def GenerateWhiskTrackerProof(
    tracker: WhiskTracker,
    k: Fr,
    rng: Optional[ProofRng] = None,
) -> SerializedWhiskTrackerProof:
    transcript = CurdleproofsTranscript(b"whisk_opening_proof")
    proof = TrackerOpeningProof.new(
        k_r_G=G1.from_compressed_bytes_unchecked(tracker.k_r_G),
        r_G=G1.from_compressed_bytes_unchecked(tracker.r_G),
        k_G=G1_GENERATOR * k,
        k=k,
        transcript=transcript,
        rng=rng,
    )
    return proof.to_bytes()
