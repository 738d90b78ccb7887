"""Grand-product argument: reduces  prod_i b_i = P  to one IPA.

Reference parity: grand_prod.py:23-207 (same math, same transcript labels
gprod_step1/gprod_alpha/gprod_step2/gprod_beta). TPU-first execution: the
beta-power basis rescalings (grand_prod.py:62-71 — 2n per-point scalar muls)
run as one batched device scale_points call; all MSMs hit the Pippenger
engine. The verifier needs no rescaled bases at all thanks to the vec_u /
G_sum/H_sum trick (grand_prod.py:148-158).
"""
from __future__ import annotations

from typing import List, Optional, Type, TypeVar

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr, fr_inner_product
from curdleproofs_tpu.models.ipa import IPA
from curdleproofs_tpu.models.msm_accumulator import MSMAccumulator
from curdleproofs_tpu.ops.msm import msm as compute_msm
from curdleproofs_tpu.ops.vector import scale_points
from curdleproofs_tpu.transcript.fiat_shamir import CurdleproofsTranscript
from curdleproofs_tpu.utils.rng import ProofRng, default_rng
from curdleproofs_tpu.utils.serde import (
    BufReader,
    fr_from_json,
    fr_to_bytes,
    fr_to_json,
    g1_from_json,
    g1_to_bytes,
    g1_to_json,
)

T_GP = TypeVar("T_GP", bound="GrandProductProof")


class GrandProductProof:
    def __init__(self, C: G1, r_p: Fr, ipa_proof: IPA) -> None:
        self.C = C
        self.r_p = r_p
        self.ipa_proof = ipa_proof

    @classmethod
    def new(
        cls: Type[T_GP],
        crs_G_vec: List[G1],
        crs_H_vec: List[G1],
        crs_U: G1,
        B: G1,
        gprod_result: Fr,
        vec_b: List[Fr],
        vec_b_blinders: List[Fr],
        transcript: CurdleproofsTranscript,
        rng: Optional[ProofRng] = None,
    ) -> T_GP:
        rng = rng or default_rng()
        n_blinders = len(vec_b_blinders)
        ell = len(crs_G_vec)

        transcript.append(b"gprod_step1", g1_to_bytes(B))
        transcript.append(b"gprod_step1", fr_to_bytes(gprod_result))
        alpha = transcript.get_and_append_challenge(b"gprod_alpha")

        # Step 2: partial-product vector c and its commitment
        vec_c = [Fr(1)]
        for i in range(ell - 1):
            vec_c.append(vec_c[i] * vec_b[i])
        vec_c_blinders = rng.blinders(n_blinders)
        C = compute_msm(crs_G_vec, vec_c) + compute_msm(crs_H_vec, vec_c_blinders)

        vec_r_b_plus_alpha = [rb + alpha for rb in vec_b_blinders]
        r_p = fr_inner_product(vec_r_b_plus_alpha, vec_c_blinders)

        transcript.append(b"gprod_step2", g1_to_bytes(C))
        transcript.append(b"gprod_step2", fr_to_bytes(r_p))
        beta = transcript.get_and_append_challenge(b"gprod_beta")
        beta_inv = beta.inverse()

        # beta-power ladders (host: O(n) tiny) + one batched basis rescale
        beta_inv_powers: List[Fr] = []  # beta^-1, beta^-2, ..., beta^-ell
        acc = Fr(1)
        for _ in range(ell):
            acc = acc * beta_inv
            beta_inv_powers.append(acc)
        beta_inv_ell_plus_1 = acc * beta_inv  # beta^-(ell+1)
        beta_ell_plus_1 = beta ** (ell + 1)
        beta_ell = beta ** ell

        vec_G_prime = scale_points(crs_G_vec, beta_inv_powers)
        vec_H_prime = scale_points(
            crs_H_vec, [beta_inv_ell_plus_1] * n_blinders
        )

        # d = b'_i - beta^i  where  b'_i = b_i * beta^i ... shifted by one:
        # reference grand_prod.py:73-85: b'_i = b_i * beta^{i+1},
        # d_i = b'_i - beta^i, beta_powers_i = beta^i
        vec_b_prime: List[Fr] = []
        pow_beta = beta
        for b_i in vec_b:
            vec_b_prime.append(b_i * pow_beta)
            pow_beta = pow_beta * beta
        vec_d: List[Fr] = []
        vec_beta_powers: List[Fr] = []
        pow_beta = Fr(1)
        for bp in vec_b_prime:
            vec_d.append(bp - pow_beta)
            vec_beta_powers.append(pow_beta)
            pow_beta = pow_beta * beta

        vec_d_blinders = [beta_ell_plus_1 * rb for rb in vec_r_b_plus_alpha]
        alphabeta = alpha * beta_ell_plus_1

        D = (
            B
            - compute_msm(vec_G_prime, vec_beta_powers)
            + compute_msm(vec_H_prime, [alphabeta] * n_blinders)
        )

        vec_G = list(crs_G_vec) + list(crs_H_vec)
        vec_G_prime = vec_G_prime + vec_H_prime

        inner_prod = r_p * beta_ell_plus_1 + gprod_result * beta_ell - Fr(1)

        vec_c = vec_c + vec_c_blinders
        vec_d = vec_d + vec_d_blinders

        assert fr_inner_product(vec_c, vec_d) == inner_prod

        ipa_proof = IPA.new(
            crs_G_vec=vec_G,
            crs_G_prime_vec=vec_G_prime,
            crs_H=crs_U,
            C=C,
            D=D,
            z=inner_prod,
            vec_c=vec_c,
            vec_d=vec_d,
            transcript=transcript,
            rng=rng,
        )
        return cls(C, r_p, ipa_proof)

    def verify(
        self,
        crs_G_vec: List[G1],
        crs_H_vec: List[G1],
        crs_U: G1,
        crs_G_sum: G1,
        crs_H_sum: G1,
        B: G1,
        gprod_result: Fr,
        n_blinders: int,
        transcript: CurdleproofsTranscript,
        msm_accumulator: MSMAccumulator,
    ) -> None:
        ell = len(crs_G_vec)

        transcript.append(b"gprod_step1", g1_to_bytes(B))
        transcript.append(b"gprod_step1", fr_to_bytes(gprod_result))
        alpha = transcript.get_and_append_challenge(b"gprod_alpha")

        transcript.append(b"gprod_step2", g1_to_bytes(self.C))
        transcript.append(b"gprod_step2", fr_to_bytes(self.r_p))
        beta = transcript.get_and_append_challenge(b"gprod_beta")
        beta_inv = beta.inverse()

        # vec_u for the G'-free verification (grand_prod.py:148-155)
        vec_u: List[Fr] = []
        acc = Fr(1)
        for _ in range(ell):
            acc = acc * beta_inv
            vec_u.append(acc)
        beta_inv_ell_plus_1 = acc * beta_inv
        vec_u.extend([beta_inv_ell_plus_1] * n_blinders)

        D = B - crs_G_sum * beta_inv + crs_H_sum * alpha

        vec_G = list(crs_G_vec) + list(crs_H_vec)
        inner_prod = (
            self.r_p * beta ** (ell + 1) + gprod_result * beta ** ell - Fr(1)
        )

        self.ipa_proof.verify(
            crs_G_vec=vec_G,
            crs_H=crs_U,
            C=self.C,
            D=D,
            inner_prod=inner_prod,
            vec_u=vec_u,
            transcript=transcript,
            msm_accumulator=msm_accumulator,
        )

    # -- serde (grand_prod.py:194-207) --------------------------------------

    def to_json(self):
        return {
            "C": g1_to_json(self.C),
            "r_p": fr_to_json(self.r_p),
            "ipa_proof": self.ipa_proof.to_json(),
        }

    @classmethod
    def from_json(cls: Type[T_GP], data) -> T_GP:
        return cls(
            C=g1_from_json(data["C"]),
            r_p=fr_from_json(data["r_p"]),
            ipa_proof=IPA.from_json(data["ipa_proof"]),
        )

    def to_bytes(self) -> bytes:
        return b"".join(
            [g1_to_bytes(self.C), fr_to_bytes(self.r_p), self.ipa_proof.to_bytes()]
        )

    @classmethod
    def from_bytes(cls: Type[T_GP], b: BufReader, n: int) -> T_GP:
        return cls(C=b.read_g1(), r_p=b.read_fr(), ipa_proof=IPA.from_bytes(b, n))
