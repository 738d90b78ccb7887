"""Same-permutation argument (Neff-style).

Proves commitments A and M open to the same permutation sigma by reducing to
a grand product of (a_sigma(i) + sigma(i)*alpha + beta). Reference parity:
same_perm.py:21-146 (labels same_perm_step1/alpha/beta; B = A + alpha*M +
<beta*1, G>).
"""
from __future__ import annotations

from typing import List, Optional, Type, TypeVar

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.models.grand_product import GrandProductProof
from curdleproofs_tpu.models.msm_accumulator import MSMAccumulator
from curdleproofs_tpu.ops.msm import msm as compute_msm
from curdleproofs_tpu.transcript.fiat_shamir import CurdleproofsTranscript
from curdleproofs_tpu.utils.rng import ProofRng, default_rng
from curdleproofs_tpu.utils.serde import (
    BufReader,
    fr_to_bytes,
    g1_from_json,
    g1_to_bytes,
    g1_to_json,
    points_to_transcript_bytes,
)


def get_permutation(vec, permutation: List[int]):
    """vec reordered by permutation indices (reference util.py:93-96)."""
    return [vec[int(i)] for i in permutation]


T_SP = TypeVar("T_SP", bound="SamePermutationProof")


class SamePermutationProof:
    def __init__(self, B: G1, grand_prod_proof: GrandProductProof) -> None:
        self.B = B
        self.grand_prod_proof = grand_prod_proof

    @classmethod
    def new(
        cls: Type[T_SP],
        crs_G_vec: List[G1],
        crs_H_vec: List[G1],
        crs_U: G1,
        A: G1,
        M: G1,
        vec_a: List[Fr],
        permutation: List[int],
        vec_a_blinders: List[Fr],
        vec_m_blinders: List[Fr],
        transcript: CurdleproofsTranscript,
        rng: Optional[ProofRng] = None,
    ) -> T_SP:
        rng = rng or default_rng()
        n_blinders = len(vec_a_blinders)
        ell = len(crs_G_vec)

        transcript.append_list(b"same_perm_step1", points_to_transcript_bytes([A, M]))
        transcript.append_list(b"same_perm_step1", [fr_to_bytes(a) for a in vec_a])
        alpha = transcript.get_and_append_challenge(b"same_perm_alpha")
        beta = transcript.get_and_append_challenge(b"same_perm_beta")

        vec_a_permuted = get_permutation(vec_a, permutation)
        factors = [
            a + Fr(m) * alpha + beta for a, m in zip(vec_a_permuted, permutation)
        ]
        gprod_result = Fr(1)
        for f in factors:
            gprod_result = gprod_result * f

        B = (A + M * alpha) + compute_msm(crs_G_vec, [beta] * ell)
        vec_b_blinders = [
            vec_a_blinders[i] + alpha * vec_m_blinders[i] for i in range(n_blinders)
        ]

        grand_prod_proof = GrandProductProof.new(
            crs_G_vec=crs_G_vec,
            crs_H_vec=crs_H_vec,
            crs_U=crs_U,
            B=B,
            gprod_result=gprod_result,
            vec_b=factors,
            vec_b_blinders=vec_b_blinders,
            transcript=transcript,
            rng=rng,
        )
        return cls(B, grand_prod_proof)

    def verify(
        self,
        crs_G_vec: List[G1],
        crs_H_vec: List[G1],
        crs_U: G1,
        crs_G_sum: G1,
        crs_H_sum: G1,
        A: G1,
        M: G1,
        vec_a: List[Fr],
        n_blinders: int,
        transcript: CurdleproofsTranscript,
        msm_accumulator: MSMAccumulator,
    ) -> None:
        ell = len(crs_G_vec)

        transcript.append_list(b"same_perm_step1", points_to_transcript_bytes([A, M]))
        transcript.append_list(b"same_perm_step1", [fr_to_bytes(a) for a in vec_a])
        alpha = transcript.get_and_append_challenge(b"same_perm_alpha")
        beta = transcript.get_and_append_challenge(b"same_perm_beta")

        factors = [a + Fr(i) * alpha + beta for i, a in enumerate(vec_a)]
        gprod_result = Fr(1)
        for f in factors:
            gprod_result = gprod_result * f

        msm_accumulator.accumulate_check(
            (self.B - A) - (M * alpha), crs_G_vec, [beta] * ell
        )

        self.grand_prod_proof.verify(
            crs_G_vec=crs_G_vec,
            crs_H_vec=crs_H_vec,
            crs_U=crs_U,
            crs_G_sum=crs_G_sum,
            crs_H_sum=crs_H_sum,
            B=self.B,
            gprod_result=gprod_result,
            n_blinders=n_blinders,
            transcript=transcript,
            msm_accumulator=msm_accumulator,
        )

    # -- serde (same_perm.py:135-146) ---------------------------------------

    def to_json(self):
        return {
            "B": g1_to_json(self.B),
            "grand_prod_proof": self.grand_prod_proof.to_json(),
        }

    @classmethod
    def from_json(cls: Type[T_SP], data) -> T_SP:
        return cls(
            B=g1_from_json(data["B"]),
            grand_prod_proof=GrandProductProof.from_json(data["grand_prod_proof"]),
        )

    def to_bytes(self) -> bytes:
        return g1_to_bytes(self.B) + self.grand_prod_proof.to_bytes()

    @classmethod
    def from_bytes(cls: Type[T_SP], b: BufReader, n: int) -> T_SP:
        return cls(B=b.read_g1(), grand_prod_proof=GrandProductProof.from_bytes(b, n))
