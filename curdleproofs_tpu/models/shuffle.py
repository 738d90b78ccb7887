"""Top-level Curdleproofs shuffle argument.

Orchestrates the same-permutation, same-scalar and same-MSM sub-arguments
over one shared transcript, with all verifier equations batched into a single
MSM via the accumulator. Reference parity: curdleproofs.py:29-361 (transcript
label schedule SURVEY.md §3.4; byte layout §3.5). The tracker
re-randomization k*vec_R / k*vec_S (curdleproofs.py:310-313 — 2*ell point
muls) runs as one batched device kernel.
"""
from __future__ import annotations

import json
from typing import List, Optional, Tuple, Type, TypeVar

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.models.commitment import GroupCommitment
from curdleproofs_tpu.models.crs import CurdleproofsCrs
from curdleproofs_tpu.models.msm_accumulator import MSMAccumulator
from curdleproofs_tpu.models.same_msm import SameMSMProof
from curdleproofs_tpu.models.same_permutation import (
    SamePermutationProof,
    get_permutation,
)
from curdleproofs_tpu.models.same_scalar import SameScalarProof
from curdleproofs_tpu.ops.msm import msm as compute_msm
from curdleproofs_tpu.ops.vector import scale_points_common
from curdleproofs_tpu.transcript.fiat_shamir import CurdleproofsTranscript
from curdleproofs_tpu.utils.errors import VerificationError
from curdleproofs_tpu.utils.rng import ProofRng, default_rng
from curdleproofs_tpu.utils.serde import (
    BufReader,
    g1_from_json,
    g1_to_bytes,
    g1_to_json,
    points_to_transcript_bytes,
)

N_BLINDERS = 4

T_CP = TypeVar("T_CP", bound="CurdleProofsProof")


class CurdleProofsProof:
    def __init__(
        self,
        A: G1,
        cm_T: GroupCommitment,
        cm_U: GroupCommitment,
        R: G1,
        S: G1,
        same_perm_proof: SamePermutationProof,
        same_scalar_proof: SameScalarProof,
        same_msm_proof: SameMSMProof,
    ) -> None:
        self.A = A
        self.cm_T = cm_T
        self.cm_U = cm_U
        self.R = R
        self.S = S
        self.same_perm_proof = same_perm_proof
        self.same_scalar_proof = same_scalar_proof
        self.same_msm_proof = same_msm_proof

    @classmethod
    def new(
        cls: Type[T_CP],
        crs: CurdleproofsCrs,
        vec_R: List[G1],
        vec_S: List[G1],
        vec_T: List[G1],
        vec_U: List[G1],
        M: G1,
        permutation: List[int],
        k: Fr,
        vec_m_blinders: List[Fr],
        rng: Optional[ProofRng] = None,
    ) -> T_CP:
        rng = rng or default_rng()
        ell = len(vec_R)

        transcript = CurdleproofsTranscript(b"curdleproofs")
        transcript.append_list(
            b"curdleproofs_step1",
            points_to_transcript_bytes(vec_R + vec_S + vec_T + vec_U),
        )
        transcript.append(b"curdleproofs_step1", g1_to_bytes(M))
        vec_a = transcript.get_and_append_challenges(b"curdleproofs_vec_a", ell)

        vec_a_blinders = rng.blinders(N_BLINDERS - 2)
        vec_r_a_prime = vec_a_blinders + [Fr(0), Fr(0)]
        vec_a_permuted = get_permutation(vec_a, permutation)

        A = compute_msm(crs.vec_G, vec_a_permuted) + compute_msm(
            crs.vec_H, vec_r_a_prime
        )

        same_perm_proof = SamePermutationProof.new(
            crs_G_vec=crs.vec_G,
            crs_H_vec=crs.vec_H,
            crs_U=crs.H,
            A=A,
            M=M,
            vec_a=vec_a,
            permutation=permutation,
            vec_a_blinders=vec_r_a_prime,
            vec_m_blinders=vec_m_blinders,
            transcript=transcript,
            rng=rng,
        )

        r_t = rng.random_scalar()
        r_u = rng.random_scalar()
        R = compute_msm(vec_R, vec_a)
        S = compute_msm(vec_S, vec_a)

        cm_T = GroupCommitment.new(crs.G_t, crs.H, R * k, r_t)
        cm_U = GroupCommitment.new(crs.G_u, crs.H, S * k, r_u)

        same_scalar_proof = SameScalarProof.new(
            crs_G_t=crs.G_t,
            crs_G_u=crs.G_u,
            crs_H=crs.H,
            R=R,
            S=S,
            cm_T=cm_T,
            cm_U=cm_U,
            k=k,
            r_t=r_t,
            r_u=r_u,
            transcript=transcript,
            rng=rng,
        )

        A_prime = A + cm_T.T_1 + cm_U.T_1
        vec_G_with_blinders = (
            crs.vec_G + crs.vec_H[: N_BLINDERS - 2] + [crs.G_t, crs.G_u]
        )
        Z1 = G1.identity()
        vec_T_with_blinders = vec_T + [Z1, Z1, crs.H, Z1]
        vec_U_with_blinders = vec_U + [Z1, Z1, Z1, crs.H]
        vec_a_with_blinders = vec_a_permuted + vec_a_blinders + [r_t, r_u]

        same_msm_proof = SameMSMProof.new(
            crs_G_vec=vec_G_with_blinders,
            A=A_prime,
            Z_t=cm_T.T_2,
            Z_u=cm_U.T_2,
            vec_T=vec_T_with_blinders,
            vec_U=vec_U_with_blinders,
            vec_x=vec_a_with_blinders,
            transcript=transcript,
            rng=rng,
        )

        return cls(
            A=A,
            cm_T=cm_T,
            cm_U=cm_U,
            R=R,
            S=S,
            same_perm_proof=same_perm_proof,
            same_scalar_proof=same_scalar_proof,
            same_msm_proof=same_msm_proof,
        )

    def verify(
        self,
        crs: CurdleproofsCrs,
        vec_R: List[G1],
        vec_S: List[G1],
        vec_T: List[G1],
        vec_U: List[G1],
        M: G1,
        rng: Optional[ProofRng] = None,
        msm_accumulator: Optional[MSMAccumulator] = None,
    ) -> None:
        """Verify; raises VerificationError on failure.

        When `msm_accumulator` is supplied the final batched MSM check is
        DEFERRED to the caller (who must call accumulator.verify()) — this is
        how many proofs amortize into one big MSM (verify_shuffle_proofs).
        """
        ell = len(vec_R)
        transcript = CurdleproofsTranscript(b"curdleproofs")
        deferred = msm_accumulator is not None
        if msm_accumulator is None:
            msm_accumulator = MSMAccumulator(rng=rng)

        if vec_T[0].is_identity():
            raise VerificationError("vec_T[0] is the identity point")

        transcript.append_list(
            b"curdleproofs_step1",
            points_to_transcript_bytes(vec_R + vec_S + vec_T + vec_U),
        )
        transcript.append(b"curdleproofs_step1", g1_to_bytes(M))
        vec_a = transcript.get_and_append_challenges(b"curdleproofs_vec_a", ell)

        self.same_perm_proof.verify(
            crs_G_vec=crs.vec_G,
            crs_H_vec=crs.vec_H,
            crs_U=crs.H,
            crs_G_sum=crs.G_sum,
            crs_H_sum=crs.H_sum,
            A=self.A,
            M=M,
            vec_a=vec_a,
            n_blinders=N_BLINDERS,
            transcript=transcript,
            msm_accumulator=msm_accumulator,
        )

        self.same_scalar_proof.verify(
            crs_G_t=crs.G_t,
            crs_G_u=crs.G_u,
            crs_H=crs.H,
            R=self.R,
            S=self.S,
            cm_T=self.cm_T,
            cm_U=self.cm_U,
            transcript=transcript,
        )

        A_prime = self.A + self.cm_T.T_1 + self.cm_U.T_1
        vec_G_with_blinders = (
            crs.vec_G + crs.vec_H[: N_BLINDERS - 2] + [crs.G_t, crs.G_u]
        )
        Z1 = G1.identity()
        vec_T_with_blinders = vec_T + [Z1, Z1, crs.H, Z1]
        vec_U_with_blinders = vec_U + [Z1, Z1, Z1, crs.H]

        self.same_msm_proof.verify(
            crs_G_vec=vec_G_with_blinders,
            A=A_prime,
            Z_t=self.cm_T.T_2,
            Z_u=self.cm_U.T_2,
            vec_T=vec_T_with_blinders,
            vec_U=vec_U_with_blinders,
            transcript=transcript,
            msm_accumulator=msm_accumulator,
        )

        msm_accumulator.accumulate_check(self.R, vec_R, vec_a)
        msm_accumulator.accumulate_check(self.S, vec_S, vec_a)
        if not deferred:
            msm_accumulator.verify()

    # -- serde (curdleproofs.py:250-298) ------------------------------------

    def to_json(self):
        return {
            "A": g1_to_json(self.A),
            "cm_T": self.cm_T.to_json(),
            "cm_U": self.cm_U.to_json(),
            "R": g1_to_json(self.R),
            "S": g1_to_json(self.S),
            "same_perm_proof": self.same_perm_proof.to_json(),
            "same_scalar_proof": self.same_scalar_proof.to_json(),
            "same_msm_proof": self.same_msm_proof.to_json(),
        }

    @classmethod
    def from_json(cls: Type[T_CP], data) -> T_CP:
        return cls(
            A=g1_from_json(data["A"]),
            cm_T=GroupCommitment.from_json(data["cm_T"]),
            cm_U=GroupCommitment.from_json(data["cm_U"]),
            R=g1_from_json(data["R"]),
            S=g1_from_json(data["S"]),
            same_perm_proof=SamePermutationProof.from_json(data["same_perm_proof"]),
            same_scalar_proof=SameScalarProof.from_json(data["same_scalar_proof"]),
            same_msm_proof=SameMSMProof.from_json(data["same_msm_proof"]),
        )

    def to_bytes(self) -> bytes:
        return b"".join(
            [
                g1_to_bytes(self.A),
                self.cm_T.to_bytes(),
                self.cm_U.to_bytes(),
                g1_to_bytes(self.R),
                g1_to_bytes(self.S),
                self.same_perm_proof.to_bytes(),
                self.same_scalar_proof.to_bytes(),
                self.same_msm_proof.to_bytes(),
            ]
        )

    @classmethod
    def from_bytes(cls: Type[T_CP], b: BufReader, n: int) -> T_CP:
        return cls(
            A=b.read_g1(),
            cm_T=GroupCommitment.from_bytes(b),
            cm_U=GroupCommitment.from_bytes(b),
            R=b.read_g1(),
            S=b.read_g1(),
            same_perm_proof=SamePermutationProof.from_bytes(b, n),
            same_scalar_proof=SameScalarProof.from_bytes(b),
            same_msm_proof=SameMSMProof.from_bytes(b, n),
        )


def verify_shuffle_proofs(
    crs: CurdleproofsCrs,
    instances: List[Tuple["CurdleProofsProof", "VerifierInput"]],
    rng: Optional[ProofRng] = None,
) -> None:
    """Batched verification: N proofs share ONE MSM accumulator, so all
    their verifier equations collapse into a single large device MSM
    (BASELINE config 4: '64 proofs via one aggregated MSM'). Soundness is
    preserved by the accumulator's per-check random linear combination.
    Raises VerificationError if any proof fails."""
    acc = MSMAccumulator(rng=rng)
    for proof, vi in instances:
        proof.verify(
            crs,
            vi.vec_R,
            vi.vec_S,
            vi.vec_T,
            vi.vec_U,
            vi.M,
            msm_accumulator=acc,
        )
    acc.verify()


def shuffle_permute_and_commit_input(
    crs: CurdleproofsCrs,
    vec_R: List[G1],
    vec_S: List[G1],
    permutation: List[int],
    k: Fr,
    rng: Optional[ProofRng] = None,
) -> Tuple[List[G1], List[G1], G1, List[Fr]]:
    """Re-randomize trackers by k, permute, and commit to the permutation
    (reference curdleproofs.py:301-321). The 2*ell point muls are one batched
    device call."""
    rng = rng or default_rng()
    ell = len(crs.vec_G)

    vec_T = get_permutation(scale_points_common(vec_R, k), permutation)
    vec_U = get_permutation(scale_points_common(vec_S, k), permutation)

    sigma_ell = get_permutation([Fr(i) for i in range(ell)], permutation)
    vec_m_blinders = rng.blinders(N_BLINDERS)
    M = compute_msm(crs.vec_G, sigma_ell) + compute_msm(crs.vec_H, vec_m_blinders)
    return vec_T, vec_U, M, vec_m_blinders


T_VI = TypeVar("T_VI", bound="VerifierInput")


class VerifierInput:
    def __init__(
        self,
        vec_R: List[G1],
        vec_S: List[G1],
        vec_T: List[G1],
        vec_U: List[G1],
        M: G1,
    ) -> None:
        self.vec_R = vec_R
        self.vec_S = vec_S
        self.vec_T = vec_T
        self.vec_U = vec_U
        self.M = M

    def to_json(self) -> str:
        return json.dumps(
            {
                "vec_R": [g1_to_json(p) for p in self.vec_R],
                "vec_S": [g1_to_json(p) for p in self.vec_S],
                "vec_T": [g1_to_json(p) for p in self.vec_T],
                "vec_U": [g1_to_json(p) for p in self.vec_U],
                "M": g1_to_json(self.M),
            }
        )

    @classmethod
    def from_json(cls: Type[T_VI], json_str: str) -> T_VI:
        d = json.loads(json_str)
        return cls(
            vec_R=[g1_from_json(p) for p in d["vec_R"]],
            vec_S=[g1_from_json(p) for p in d["vec_S"]],
            vec_T=[g1_from_json(p) for p in d["vec_T"]],
            vec_U=[g1_from_json(p) for p in d["vec_U"]],
            M=g1_from_json(d["M"]),
        )
