"""Same-scalar argument (Sigma-protocol).

Proves cm_T and cm_U commit to R*k and S*k with a common secret k. Reference
parity: same_scalar.py:14-149 (labels sameexp_points/same_scalar_alpha; the
only verifier using direct point equality instead of the MSM accumulator).
"""
from __future__ import annotations

from typing import Optional, Type, TypeVar

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.models.commitment import GroupCommitment
from curdleproofs_tpu.transcript.fiat_shamir import CurdleproofsTranscript
from curdleproofs_tpu.utils.errors import check
from curdleproofs_tpu.utils.rng import ProofRng, default_rng
from curdleproofs_tpu.utils.serde import (
    BufReader,
    fr_from_json,
    fr_to_bytes,
    fr_to_json,
    points_to_transcript_bytes,
)

T_SS = TypeVar("T_SS", bound="SameScalarProof")


class SameScalarProof:
    def __init__(
        self,
        cm_A: GroupCommitment,
        cm_B: GroupCommitment,
        z_k: Fr,
        z_t: Fr,
        z_u: Fr,
    ) -> None:
        self.cm_A = cm_A
        self.cm_B = cm_B
        self.z_k = z_k
        self.z_t = z_t
        self.z_u = z_u

    @classmethod
    def new(
        cls: Type[T_SS],
        crs_G_t: G1,
        crs_G_u: G1,
        crs_H: G1,
        R: G1,
        S: G1,
        cm_T: GroupCommitment,
        cm_U: GroupCommitment,
        k: Fr,
        r_t: Fr,
        r_u: Fr,
        transcript: CurdleproofsTranscript,
        rng: Optional[ProofRng] = None,
    ) -> T_SS:
        rng = rng or default_rng()
        r_a = rng.random_scalar()
        r_b = rng.random_scalar()
        r_k = rng.random_scalar()

        cm_A = GroupCommitment.new(crs_G_t, crs_H, R * r_k, r_a)
        cm_B = GroupCommitment.new(crs_G_u, crs_H, S * r_k, r_b)

        transcript.append_list(
            b"sameexp_points",
            points_to_transcript_bytes(
                [R, S, cm_T.T_1, cm_T.T_2, cm_U.T_1, cm_U.T_2,
                 cm_A.T_1, cm_A.T_2, cm_B.T_1, cm_B.T_2]
            ),
        )
        alpha = transcript.get_and_append_challenge(b"same_scalar_alpha")

        return cls(cm_A, cm_B, r_k + k * alpha, r_a + r_t * alpha, r_b + r_u * alpha)

    def verify(
        self,
        crs_G_t: G1,
        crs_G_u: G1,
        crs_H: G1,
        R: G1,
        S: G1,
        cm_T: GroupCommitment,
        cm_U: GroupCommitment,
        transcript: CurdleproofsTranscript,
    ) -> None:
        transcript.append_list(
            b"sameexp_points",
            points_to_transcript_bytes(
                [R, S, cm_T.T_1, cm_T.T_2, cm_U.T_1, cm_U.T_2,
                 self.cm_A.T_1, self.cm_A.T_2, self.cm_B.T_1, self.cm_B.T_2]
            ),
        )
        alpha = transcript.get_and_append_challenge(b"same_scalar_alpha")

        expected_1 = GroupCommitment.new(crs_G_t, crs_H, R * self.z_k, self.z_t)
        expected_2 = GroupCommitment.new(crs_G_u, crs_H, S * self.z_k, self.z_u)
        computed_1 = self.cm_A + cm_T * alpha
        computed_2 = self.cm_B + cm_U * alpha
        check(
            expected_1 == computed_1 and expected_2 == computed_2,
            "same-scalar sigma-protocol check failed",
        )

    # -- serde (same_scalar.py:132-149) -------------------------------------

    def to_json(self):
        return {
            "cm_A": self.cm_A.to_json(),
            "cm_B": self.cm_B.to_json(),
            "z_k": fr_to_json(self.z_k),
            "z_t": fr_to_json(self.z_t),
            "z_u": fr_to_json(self.z_u),
        }

    @classmethod
    def from_json(cls: Type[T_SS], data) -> T_SS:
        return cls(
            cm_A=GroupCommitment.from_json(data["cm_A"]),
            cm_B=GroupCommitment.from_json(data["cm_B"]),
            z_k=fr_from_json(data["z_k"]),
            z_t=fr_from_json(data["z_t"]),
            z_u=fr_from_json(data["z_u"]),
        )

    def to_bytes(self) -> bytes:
        return b"".join(
            [
                self.cm_A.to_bytes(),
                self.cm_B.to_bytes(),
                fr_to_bytes(self.z_k),
                fr_to_bytes(self.z_t),
                fr_to_bytes(self.z_u),
            ]
        )

    @classmethod
    def from_bytes(cls: Type[T_SS], b: BufReader) -> T_SS:
        return cls(
            cm_A=GroupCommitment.from_bytes(b),
            cm_B=GroupCommitment.from_bytes(b),
            z_k=b.read_fr(),
            z_t=b.read_fr(),
            z_u=b.read_fr(),
        )
