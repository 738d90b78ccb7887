"""Bulletproofs-style inner-product argument.

Proves z = <c, d> under commitments C = <c, G>, D = <d, G'> with log2(n)
folding rounds. Math and transcript schedule are bit-compatible with the
reference (ipa.py:27-233); execution is restructured TPU-first:

  * all MSMs (B_c/B_d, per-round L/R) run on the device Pippenger engine
  * per-round basis folds G_L + gamma*G_R are batched device kernels
    (ops.vector.fold_points) instead of per-point loops (ipa.py:145-146)
  * scalar-vector folds stay host-side exact Fr (they are O(n) tiny)
  * the O(n) verifier scalars vec_s come from the bitstring product trick
    (ipa.py:164-184) and feed two accumulated MSM checks

Unlike the reference prover, inputs are never mutated in place (the reference
mutates its argument lists — ipa.py:107-109 — a hazard SURVEY.md §5 flags).
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Type, TypeVar

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr, fr_inner_product
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


def get_verification_scalars_bitstring(n: int, lg_n: int) -> List[List[int]]:
    """bitstring[i] = positions of set bits of i in lg_n-wide big-endian form
    (reference util.py:71-78)."""
    out = []
    for i in range(n):
        bs = bin(i)[2:].zfill(lg_n)
        out.append([j for j in range(lg_n) if bs[j] == "1"])
    return out


def generate_ipa_blinders(
    c: List[Fr], d: List[Fr], rng: Optional[ProofRng] = None
) -> Tuple[List[Fr], List[Fr]]:
    """Blinders (r, z) with <r, d> + <z, c> = 0 and <r, z> = 0
    (reference ipa.py:27-48): sample all but two z freely, then solve the two
    linear constraints for the last pair."""
    rng = rng or default_rng()
    n = len(c)
    r = rng.blinders(n)
    z = rng.blinders(n - 2)

    omega = fr_inner_product(r, d) + fr_inner_product(z, c[: n - 2])
    delta = fr_inner_product(r[: n - 2], z)

    inv_c = c[n - 2].inverse()
    last_z = (r[n - 2] * inv_c * omega - delta) * (
        -r[n - 2] * inv_c * c[n - 1] + r[n - 1]
    ).inverse()
    penultimate_z = -inv_c * (last_z * c[n - 1] + omega)
    z = z + [penultimate_z, last_z]

    assert fr_inner_product(r, d) + fr_inner_product(z, c) == Fr(0)
    assert fr_inner_product(r, z) == Fr(0)
    return r, z


T_IPA = TypeVar("T_IPA", bound="IPA")


class IPA:
    def __init__(
        self,
        B_c: G1,
        B_d: G1,
        vec_L_C: List[G1],
        vec_R_C: List[G1],
        vec_L_D: List[G1],
        vec_R_D: List[G1],
        c_final: Fr,
        d_final: Fr,
    ) -> None:
        self.B_c = B_c
        self.B_d = B_d
        self.vec_L_C = vec_L_C
        self.vec_R_C = vec_R_C
        self.vec_L_D = vec_L_D
        self.vec_R_D = vec_R_D
        self.c_final = c_final
        self.d_final = d_final

    @classmethod
    def new(
        cls: Type[T_IPA],
        crs_G_vec: List[G1],
        crs_G_prime_vec: List[G1],
        crs_H: G1,
        C: G1,
        D: G1,
        z: Fr,
        vec_c: List[Fr],
        vec_d: List[Fr],
        transcript: CurdleproofsTranscript,
        rng: Optional[ProofRng] = None,
    ) -> T_IPA:
        rng = rng or default_rng()
        n = len(vec_c)
        if n & (n - 1) or n == 0:
            raise InvalidInputError("IPA size must be a power of two")
        if n != len(vec_d):
            raise InvalidInputError("len(vec_c) != len(vec_d)")

        vec_r_c, vec_r_d = generate_ipa_blinders(vec_c, vec_d, rng)

        B_c = compute_msm(crs_G_vec, vec_r_c)
        B_d = compute_msm(crs_G_prime_vec, vec_r_d)

        transcript.append_list(b"ipa_step1", points_to_transcript_bytes([C, D]))
        transcript.append(b"ipa_step1", fr_to_bytes(z))
        transcript.append_list(b"ipa_step1", points_to_transcript_bytes([B_c, B_d]))
        alpha = transcript.get_and_append_challenge(b"ipa_alpha")
        beta = transcript.get_and_append_challenge(b"ipa_beta")

        vec_c = [rc + alpha * ci for rc, ci in zip(vec_r_c, vec_c)]
        vec_d = [rd + alpha * di for rd, di in zip(vec_r_d, vec_d)]
        H = crs_H * beta

        G = list(crs_G_vec)
        Gp = list(crs_G_prime_vec)
        vec_L_C: List[G1] = []
        vec_R_C: List[G1] = []
        vec_L_D: List[G1] = []
        vec_R_D: List[G1] = []

        while n > 1:
            n //= 2
            c_L, c_R = vec_c[:n], vec_c[n:]
            d_L, d_R = vec_d[:n], vec_d[n:]
            G_L, G_R = G[:n], G[n:]
            Gp_L, Gp_R = Gp[:n], Gp[n:]

            L_C = compute_msm(G_R, c_L) + H * fr_inner_product(c_L, d_R)
            L_D = compute_msm(Gp_L, d_R)
            R_C = compute_msm(G_L, c_R) + H * fr_inner_product(c_R, d_L)
            R_D = compute_msm(Gp_R, d_L)

            vec_L_C.append(L_C)
            vec_R_C.append(R_C)
            vec_L_D.append(L_D)
            vec_R_D.append(R_D)

            transcript.append_list(
                b"ipa_loop", points_to_transcript_bytes([L_C, L_D, R_C, R_D])
            )
            gamma = transcript.get_and_append_challenge(b"ipa_gamma")
            gamma_inv = gamma.inverse()

            vec_c = [cl + gamma_inv * cr for cl, cr in zip(c_L, c_R)]
            vec_d = [dl + gamma * dr for dl, dr in zip(d_L, d_R)]
            G = fold_points(G_L, G_R, gamma)
            Gp = fold_points(Gp_L, Gp_R, gamma_inv)

        return cls(B_c, B_d, vec_L_C, vec_R_C, vec_L_D, vec_R_D, vec_c[0], vec_d[0])

    def verification_scalars(
        self, n: int, transcript: CurdleproofsTranscript
    ) -> Tuple[List[Fr], List[Fr], List[Fr], List[Fr]]:
        lg_n = len(self.vec_L_C)
        if lg_n >= 32:
            raise InvalidInputError("proof too large (lg_n >= 32)")
        if n != (1 << lg_n):
            raise InvalidInputError("n != 2 ** lg_n")

        bitstring = get_verification_scalars_bitstring(n, lg_n)

        challenges: List[Fr] = []
        for i in range(lg_n):
            transcript.append_list(
                b"ipa_loop",
                points_to_transcript_bytes(
                    [self.vec_L_C[i], self.vec_L_D[i], self.vec_R_C[i], self.vec_R_D[i]]
                ),
            )
            challenges.append(transcript.get_and_append_challenge(b"ipa_gamma"))

        challenges_inv = [c.inverse() for c in challenges]

        vec_s: List[Fr] = []
        for i in range(n):
            s = Fr(1)
            for j in bitstring[i]:
                s = s * challenges[j]
            vec_s.append(s)
        vec_s_inv = [s.inverse() for s in vec_s]
        return challenges, challenges_inv, vec_s, vec_s_inv

    def verify(
        self,
        crs_G_vec: List[G1],
        crs_H: G1,
        C: G1,
        D: G1,
        inner_prod: Fr,
        vec_u: List[Fr],
        transcript: CurdleproofsTranscript,
        msm_accumulator: MSMAccumulator,
    ) -> None:
        n = len(crs_G_vec)

        transcript.append_list(b"ipa_step1", points_to_transcript_bytes([C, D]))
        transcript.append(b"ipa_step1", fr_to_bytes(inner_prod))
        transcript.append_list(
            b"ipa_step1", points_to_transcript_bytes([self.B_c, self.B_d])
        )
        alpha = transcript.get_and_append_challenge(b"ipa_alpha")
        beta = transcript.get_and_append_challenge(b"ipa_beta")

        vec_gamma, vec_gamma_inv, vec_s, vec_s_inv = self.verification_scalars(
            n, transcript
        )

        vec_rhs_scalars = [self.c_final * s for s in vec_s] + [
            self.c_final * self.d_final * beta
        ]
        vec_G_H = list(crs_G_vec) + [crs_H]

        H = crs_H * beta
        C_a = self.B_c + C * alpha + H * (alpha * alpha * inner_prod)
        point_lhs = (
            compute_msm(self.vec_L_C, vec_gamma)
            + C_a
            + compute_msm(self.vec_R_C, vec_gamma_inv)
        )
        msm_accumulator.accumulate_check(point_lhs, vec_G_H, vec_rhs_scalars)

        vec_d_div_s = [
            self.d_final * (s_inv * u) for s_inv, u in zip(vec_s_inv, vec_u)
        ]
        D_a = self.B_d + D * alpha
        point_lhs = (
            compute_msm(self.vec_L_D, vec_gamma)
            + D_a
            + compute_msm(self.vec_R_D, vec_gamma_inv)
        )
        msm_accumulator.accumulate_check(point_lhs, crs_G_vec, vec_d_div_s)

    # -- serde (layout: ipa.py:260-284) -------------------------------------

    def to_json(self):
        return {
            "B_c": g1_to_json(self.B_c),
            "B_d": g1_to_json(self.B_d),
            "vec_L_C": [g1_to_json(p) for p in self.vec_L_C],
            "vec_R_C": [g1_to_json(p) for p in self.vec_R_C],
            "vec_L_D": [g1_to_json(p) for p in self.vec_L_D],
            "vec_R_D": [g1_to_json(p) for p in self.vec_R_D],
            "c_final": fr_to_json(self.c_final),
            "d_final": fr_to_json(self.d_final),
        }

    @classmethod
    def from_json(cls: Type[T_IPA], data) -> T_IPA:
        return cls(
            B_c=g1_from_json(data["B_c"]),
            B_d=g1_from_json(data["B_d"]),
            vec_L_C=[g1_from_json(p) for p in data["vec_L_C"]],
            vec_R_C=[g1_from_json(p) for p in data["vec_R_C"]],
            vec_L_D=[g1_from_json(p) for p in data["vec_L_D"]],
            vec_R_D=[g1_from_json(p) for p in data["vec_R_D"]],
            c_final=fr_from_json(data["c_final"]),
            d_final=fr_from_json(data["d_final"]),
        )

    def to_bytes(self) -> bytes:
        return b"".join(
            [
                g1_to_bytes(self.B_c),
                g1_to_bytes(self.B_d),
                g1_list_to_bytes(self.vec_L_C),
                g1_list_to_bytes(self.vec_R_C),
                g1_list_to_bytes(self.vec_L_D),
                g1_list_to_bytes(self.vec_R_D),
                fr_to_bytes(self.c_final),
                fr_to_bytes(self.d_final),
            ]
        )

    @classmethod
    def from_bytes(cls: Type[T_IPA], b: BufReader, n: int) -> T_IPA:
        lg_n = log2_int(n)
        return cls(
            B_c=b.read_g1(),
            B_d=b.read_g1(),
            vec_L_C=[b.read_g1() for _ in range(lg_n)],
            vec_R_C=[b.read_g1() for _ in range(lg_n)],
            vec_L_D=[b.read_g1() for _ in range(lg_n)],
            vec_R_D=[b.read_g1() for _ in range(lg_n)],
            c_final=b.read_fr(),
            d_final=b.read_fr(),
        )
