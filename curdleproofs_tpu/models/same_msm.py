"""Same-MSM argument: three-way Bulletproofs-style folding.

Proves A = <x, G>, Z_t = <x, T>, Z_u = <x, U> share one scalar vector x.
Reference parity: same_msm.py:25-285 (labels same_msm_step1/alpha/loop/gamma;
6 L/R points per round). The prover's per-round point-vector folds of T, U
and G (same_msm.py:122-131 — the hot loop SURVEY.md §2 row 13 flags) run as
batched device fold kernels.
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Type, TypeVar

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.models.ipa import get_verification_scalars_bitstring
from curdleproofs_tpu.models.msm_accumulator import MSMAccumulator
from curdleproofs_tpu.ops.msm import msm as compute_msm
from curdleproofs_tpu.ops.vector import fold_points
from curdleproofs_tpu.transcript.fiat_shamir import CurdleproofsTranscript
from curdleproofs_tpu.utils.errors import InvalidInputError
from curdleproofs_tpu.utils.rng import ProofRng, default_rng
from curdleproofs_tpu.utils.serde import (
    BufReader,
    fr_from_json,
    fr_to_bytes,
    fr_to_json,
    g1_from_json,
    g1_list_to_bytes,
    g1_to_bytes,
    g1_to_json,
    log2_int,
    points_to_transcript_bytes,
)

T_SM = TypeVar("T_SM", bound="SameMSMProof")


class SameMSMProof:
    def __init__(
        self,
        B_a: G1,
        B_t: G1,
        B_u: G1,
        vec_L_A: List[G1],
        vec_L_T: List[G1],
        vec_L_U: List[G1],
        vec_R_A: List[G1],
        vec_R_T: List[G1],
        vec_R_U: List[G1],
        x_final: Fr,
    ) -> None:
        self.B_a = B_a
        self.B_t = B_t
        self.B_u = B_u
        self.vec_L_A = vec_L_A
        self.vec_L_T = vec_L_T
        self.vec_L_U = vec_L_U
        self.vec_R_A = vec_R_A
        self.vec_R_T = vec_R_T
        self.vec_R_U = vec_R_U
        self.x_final = x_final

    @classmethod
    def new(
        cls: Type[T_SM],
        crs_G_vec: List[G1],
        A: G1,
        Z_t: G1,
        Z_u: G1,
        vec_T: List[G1],
        vec_U: List[G1],
        vec_x: List[Fr],
        transcript: CurdleproofsTranscript,
        rng: Optional[ProofRng] = None,
    ) -> T_SM:
        rng = rng or default_rng()
        n = len(vec_x)
        if n & (n - 1) or n == 0:
            raise InvalidInputError("same-msm size must be a power of two")

        vec_r = rng.blinders(n)
        B_a = compute_msm(crs_G_vec, vec_r)
        B_t = compute_msm(vec_T, vec_r)
        B_u = compute_msm(vec_U, vec_r)

        transcript.append_list(
            b"same_msm_step1", points_to_transcript_bytes([A, Z_t, Z_u])
        )
        transcript.append_list(
            b"same_msm_step1", points_to_transcript_bytes(list(vec_T) + list(vec_U))
        )
        transcript.append_list(
            b"same_msm_step1", points_to_transcript_bytes([B_a, B_t, B_u])
        )
        alpha = transcript.get_and_append_challenge(b"same_msm_alpha")

        vec_x = [r + alpha * x for r, x in zip(vec_r, vec_x)]
        T = list(vec_T)
        U = list(vec_U)
        G = list(crs_G_vec)

        vec_L_A: List[G1] = []
        vec_L_T: List[G1] = []
        vec_L_U: List[G1] = []
        vec_R_A: List[G1] = []
        vec_R_T: List[G1] = []
        vec_R_U: List[G1] = []

        while n > 1:
            n //= 2
            x_L, x_R = vec_x[:n], vec_x[n:]
            T_L, T_R = T[:n], T[n:]
            U_L, U_R = U[:n], U[n:]
            G_L, G_R = G[:n], G[n:]

            L_A = compute_msm(G_R, x_L)
            L_T = compute_msm(T_R, x_L)
            L_U = compute_msm(U_R, x_L)
            R_A = compute_msm(G_L, x_R)
            R_T = compute_msm(T_L, x_R)
            R_U = compute_msm(U_L, x_R)

            vec_L_A.append(L_A)
            vec_L_T.append(L_T)
            vec_L_U.append(L_U)
            vec_R_A.append(R_A)
            vec_R_T.append(R_T)
            vec_R_U.append(R_U)

            transcript.append_list(
                b"same_msm_loop",
                points_to_transcript_bytes([L_A, L_T, L_U, R_A, R_T, R_U]),
            )
            gamma = transcript.get_and_append_challenge(b"same_msm_gamma")
            gamma_inv = gamma.inverse()

            vec_x = [xl + gamma_inv * xr for xl, xr in zip(x_L, x_R)]
            T = fold_points(T_L, T_R, gamma)
            U = fold_points(U_L, U_R, gamma)
            G = fold_points(G_L, G_R, gamma)

        return cls(
            B_a=B_a,
            B_t=B_t,
            B_u=B_u,
            vec_L_A=vec_L_A,
            vec_L_T=vec_L_T,
            vec_L_U=vec_L_U,
            vec_R_A=vec_R_A,
            vec_R_T=vec_R_T,
            vec_R_U=vec_R_U,
            x_final=vec_x[0],
        )

    def verification_scalars(
        self, n: int, transcript: CurdleproofsTranscript
    ) -> Tuple[List[Fr], List[Fr], List[Fr]]:
        lg_n = len(self.vec_L_A)
        if lg_n >= 32:
            raise InvalidInputError("proof too large (lg_n >= 32)")
        if (1 << lg_n) != n:
            raise InvalidInputError("2**lg_n != n")

        bitstring = get_verification_scalars_bitstring(n, lg_n)
        challenges: List[Fr] = []
        for i in range(lg_n):
            transcript.append_list(
                b"same_msm_loop",
                points_to_transcript_bytes(
                    [
                        self.vec_L_A[i],
                        self.vec_L_T[i],
                        self.vec_L_U[i],
                        self.vec_R_A[i],
                        self.vec_R_T[i],
                        self.vec_R_U[i],
                    ]
                ),
            )
            challenges.append(transcript.get_and_append_challenge(b"same_msm_gamma"))

        challenges_inv = [c.inverse() for c in challenges]
        vec_s: List[Fr] = []
        for i in range(n):
            s = Fr(1)
            for j in bitstring[i]:
                s = s * challenges[j]
            vec_s.append(s)
        return challenges, challenges_inv, vec_s

    def verify(
        self,
        crs_G_vec: List[G1],
        A: G1,
        Z_t: G1,
        Z_u: G1,
        vec_T: List[G1],
        vec_U: List[G1],
        transcript: CurdleproofsTranscript,
        msm_accumulator: MSMAccumulator,
    ) -> None:
        n = len(vec_T)

        transcript.append_list(
            b"same_msm_step1", points_to_transcript_bytes([A, Z_t, Z_u])
        )
        transcript.append_list(
            b"same_msm_step1", points_to_transcript_bytes(list(vec_T) + list(vec_U))
        )
        transcript.append_list(
            b"same_msm_step1",
            points_to_transcript_bytes([self.B_a, self.B_t, self.B_u]),
        )
        alpha = transcript.get_and_append_challenge(b"same_msm_alpha")

        vec_gamma, vec_gamma_inv, vec_s = self.verification_scalars(n, transcript)
        vec_x_times_s = [self.x_final * s for s in vec_s]

        A_a = self.B_a + A * alpha
        Z_t_a = self.B_t + Z_t * alpha
        Z_u_a = self.B_u + Z_u * alpha

        lhs = (
            compute_msm(self.vec_L_A, vec_gamma)
            + A_a
            + compute_msm(self.vec_R_A, vec_gamma_inv)
        )
        msm_accumulator.accumulate_check(lhs, crs_G_vec, vec_x_times_s)

        lhs = (
            compute_msm(self.vec_L_T, vec_gamma)
            + Z_t_a
            + compute_msm(self.vec_R_T, vec_gamma_inv)
        )
        msm_accumulator.accumulate_check(lhs, vec_T, vec_x_times_s)

        lhs = (
            compute_msm(self.vec_L_U, vec_gamma)
            + Z_u_a
            + compute_msm(self.vec_R_U, vec_gamma_inv)
        )
        msm_accumulator.accumulate_check(lhs, vec_U, vec_x_times_s)

    # -- serde (same_msm.py:257-285) ----------------------------------------

    def to_json(self):
        return {
            "B_a": g1_to_json(self.B_a),
            "B_t": g1_to_json(self.B_t),
            "B_u": g1_to_json(self.B_u),
            "vec_L_A": [g1_to_json(p) for p in self.vec_L_A],
            "vec_L_T": [g1_to_json(p) for p in self.vec_L_T],
            "vec_L_U": [g1_to_json(p) for p in self.vec_L_U],
            "vec_R_A": [g1_to_json(p) for p in self.vec_R_A],
            "vec_R_T": [g1_to_json(p) for p in self.vec_R_T],
            "vec_R_U": [g1_to_json(p) for p in self.vec_R_U],
            "x_final": fr_to_json(self.x_final),
        }

    @classmethod
    def from_json(cls: Type[T_SM], data) -> T_SM:
        return cls(
            B_a=g1_from_json(data["B_a"]),
            B_t=g1_from_json(data["B_t"]),
            B_u=g1_from_json(data["B_u"]),
            vec_L_A=[g1_from_json(p) for p in data["vec_L_A"]],
            vec_L_T=[g1_from_json(p) for p in data["vec_L_T"]],
            vec_L_U=[g1_from_json(p) for p in data["vec_L_U"]],
            vec_R_A=[g1_from_json(p) for p in data["vec_R_A"]],
            vec_R_T=[g1_from_json(p) for p in data["vec_R_T"]],
            vec_R_U=[g1_from_json(p) for p in data["vec_R_U"]],
            x_final=fr_from_json(data["x_final"]),
        )

    def to_bytes(self) -> bytes:
        return b"".join(
            [
                g1_to_bytes(self.B_a),
                g1_to_bytes(self.B_t),
                g1_to_bytes(self.B_u),
                g1_list_to_bytes(self.vec_L_A),
                g1_list_to_bytes(self.vec_L_T),
                g1_list_to_bytes(self.vec_L_U),
                g1_list_to_bytes(self.vec_R_A),
                g1_list_to_bytes(self.vec_R_T),
                g1_list_to_bytes(self.vec_R_U),
                fr_to_bytes(self.x_final),
            ]
        )

    @classmethod
    def from_bytes(cls: Type[T_SM], b: BufReader, n: int) -> T_SM:
        lg_n = log2_int(n)
        return cls(
            B_a=b.read_g1(),
            B_t=b.read_g1(),
            B_u=b.read_g1(),
            vec_L_A=[b.read_g1() for _ in range(lg_n)],
            vec_L_T=[b.read_g1() for _ in range(lg_n)],
            vec_L_U=[b.read_g1() for _ in range(lg_n)],
            vec_R_A=[b.read_g1() for _ in range(lg_n)],
            vec_R_T=[b.read_g1() for _ in range(lg_n)],
            vec_R_U=[b.read_g1() for _ in range(lg_n)],
            x_final=b.read_fr(),
        )
