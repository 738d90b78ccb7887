"""Batched MSM verification accumulator.

Folds every verifier equation C_j =? <s_j, B_j> into ONE deferred check via a
random linear combination: per check draw rho_j, accumulate A_c += rho_j*C_j
and per-base scalar map[B] += rho_j*s_i (deduping bases by compressed bytes),
then verify a single large MSM against A_c — the verifier hot spot that the
TPU Pippenger engine executes in one shot.

Reference parity: msm_accumulator.py:32-68 (identical semantics: infinity
bases skipped, bases keyed by compressed encoding, fresh randomness per
check). compute_msm here is the TPU engine, not the naive loop.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.ops.msm import msm as compute_msm
from curdleproofs_tpu.utils.errors import VerificationError, check
from curdleproofs_tpu.utils.rng import ProofRng, default_rng


class MSMAccumulator:
    def __init__(self, rng: Optional[ProofRng] = None) -> None:
        self._rng = rng or default_rng()
        self.A_c = G1.identity()
        self.base_scalar_map: Dict[bytes, Fr] = {}

    def accumulate_check(
        self, C: G1, bases: Sequence[G1], scalars: Sequence[Fr]
    ) -> None:
        if len(bases) != len(scalars):
            raise ValueError("accumulate_check length mismatch")
        rho = self._rng.random_scalar()
        self.A_c = self.A_c + C * rho
        m = self.base_scalar_map
        for base, scalar in zip(bases, scalars):
            if base.is_identity():
                continue  # infinity bases contribute nothing
            key = base.to_compressed_bytes()
            prev = m.get(key)
            add = rho * scalar
            m[key] = add if prev is None else prev + add

    def verify(self) -> None:
        bases = [G1.from_compressed_bytes_unchecked(k) for k in self.base_scalar_map]
        scalars = list(self.base_scalar_map.values())
        computed = compute_msm(bases, scalars)
        check(computed == self.A_c, "batched MSM accumulator check failed")
