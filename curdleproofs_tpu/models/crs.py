"""Common reference string for the shuffle argument.

Fields and layout mirror the reference (crs.py:19-66): vec_G[ell],
vec_H[n_blinders], H, G_t, G_u, plus derived sums G_sum/H_sum used by the
grand-product verifier's basis trick (grand_prod.py:148-158). Requires
ell + n_blinders to be a power of two.
"""
from __future__ import annotations

import json
from typing import List, Optional, Type, TypeVar

from curdleproofs_tpu.curve import G1, g1_sum
from curdleproofs_tpu.utils.errors import InvalidInputError
from curdleproofs_tpu.utils.rng import ProofRng, default_rng
from curdleproofs_tpu.utils.serde import BufReader, g1_from_json, g1_to_json

T_Crs = TypeVar("T_Crs", bound="CurdleproofsCrs")


class CurdleproofsCrs:
    __slots__ = ("vec_G", "vec_H", "H", "G_t", "G_u", "G_sum", "H_sum")

    def __init__(
        self,
        vec_G: List[G1],
        vec_H: List[G1],
        H: G1,
        G_t: G1,
        G_u: G1,
        G_sum: G1,
        H_sum: G1,
    ) -> None:
        self.vec_G = vec_G
        self.vec_H = vec_H
        self.H = H
        self.G_t = G_t
        self.G_u = G_u
        self.G_sum = G_sum
        self.H_sum = H_sum

    @property
    def ell(self) -> int:
        return len(self.vec_G)

    @property
    def n_blinders(self) -> int:
        return len(self.vec_H)

    @classmethod
    def new(
        cls: Type[T_Crs],
        ell: int,
        n_blinders: int,
        rng: Optional[ProofRng] = None,
    ) -> T_Crs:
        rng = rng or default_rng()
        count = ell + n_blinders + 3
        gen = G1()
        points = [gen * rng.random_scalar() for _ in range(count)]
        return cls.from_random_points(ell, n_blinders, points)

    @classmethod
    def from_random_points(
        cls: Type[T_Crs], ell: int, n_blinders: int, points: List[G1]
    ) -> T_Crs:
        if len(points) < ell + n_blinders + 3:
            raise InvalidInputError(
                f"need {ell + n_blinders + 3} CRS points, got {len(points)}"
            )
        n = ell + n_blinders
        if n & (n - 1) or n == 0:
            raise InvalidInputError(
                f"ell + n_blinders must be a power of two (ell={ell}, "
                f"n_blinders={n_blinders})"
            )
        vec_G = points[:ell]
        vec_H = points[ell : ell + n_blinders]
        return cls(
            vec_G=vec_G,
            vec_H=vec_H,
            H=points[n],
            G_t=points[n + 1],
            G_u=points[n + 2],
            G_sum=g1_sum(vec_G),
            H_sum=g1_sum(vec_H),
        )

    def to_json(self) -> str:
        return json.dumps(
            {
                "vec_G": [g1_to_json(g) for g in self.vec_G],
                "vec_H": [g1_to_json(h) for h in self.vec_H],
                "H": g1_to_json(self.H),
                "G_t": g1_to_json(self.G_t),
                "G_u": g1_to_json(self.G_u),
                "G_sum": g1_to_json(self.G_sum),
                "H_sum": g1_to_json(self.H_sum),
            }
        )

    @classmethod
    def from_json(cls: Type[T_Crs], json_str: str) -> T_Crs:
        d = json.loads(json_str)
        return cls(
            vec_G=[g1_from_json(g) for g in d["vec_G"]],
            vec_H=[g1_from_json(h) for h in d["vec_H"]],
            H=g1_from_json(d["H"]),
            G_t=g1_from_json(d["G_t"]),
            G_u=g1_from_json(d["G_u"]),
            G_sum=g1_from_json(d["G_sum"]),
            H_sum=g1_from_json(d["H_sum"]),
        )

    def to_bytes(self) -> bytes:
        return b"".join(
            [p.to_compressed_bytes() for p in self.vec_G]
            + [p.to_compressed_bytes() for p in self.vec_H]
            + [
                self.H.to_compressed_bytes(),
                self.G_t.to_compressed_bytes(),
                self.G_u.to_compressed_bytes(),
                self.G_sum.to_compressed_bytes(),
                self.H_sum.to_compressed_bytes(),
            ]
        )

    @classmethod
    def from_bytes(
        cls: Type[T_Crs], b: BufReader, ell: int, n_blinders: int
    ) -> T_Crs:
        return cls(
            vec_G=[b.read_g1() for _ in range(ell)],
            vec_H=[b.read_g1() for _ in range(n_blinders)],
            H=b.read_g1(),
            G_t=b.read_g1(),
            G_u=b.read_g1(),
            G_sum=b.read_g1(),
            H_sum=b.read_g1(),
        )
