"""ElGamal-style Pedersen commitment to a *group element*.

Com(T; r) = (G*r, T + H*r) — two G1 points, homomorphic in both slots.
Reference parity: curdleproofs/commitment.py:14-73.
"""
from __future__ import annotations

from typing import Type, TypeVar

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.utils.serde import BufReader, g1_from_json, g1_to_json

T_GC = TypeVar("T_GC", bound="GroupCommitment")


class GroupCommitment:
    __slots__ = ("T_1", "T_2")

    def __init__(self, T_1: G1, T_2: G1) -> None:
        self.T_1 = T_1
        self.T_2 = T_2

    @classmethod
    def new(cls: Type[T_GC], crs_G: G1, crs_H: G1, T: G1, r: Fr) -> T_GC:
        return cls(crs_G * r, T + crs_H * r)

    def __add__(self, other: "GroupCommitment") -> "GroupCommitment":
        if not isinstance(other, GroupCommitment):
            return NotImplemented
        return GroupCommitment(self.T_1 + other.T_1, self.T_2 + other.T_2)

    def __mul__(self, scalar: Fr) -> "GroupCommitment":
        if not isinstance(scalar, Fr):
            return NotImplemented
        return GroupCommitment(self.T_1 * scalar, self.T_2 * scalar)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, GroupCommitment):
            return NotImplemented
        return self.T_1 == other.T_1 and self.T_2 == other.T_2

    def to_json(self):
        return {"T_1": g1_to_json(self.T_1), "T_2": g1_to_json(self.T_2)}

    @classmethod
    def from_json(cls: Type[T_GC], data) -> T_GC:
        return cls(g1_from_json(data["T_1"]), g1_from_json(data["T_2"]))

    def to_bytes(self) -> bytes:
        return self.T_1.to_compressed_bytes() + self.T_2.to_compressed_bytes()

    @classmethod
    def from_bytes(cls: Type[T_GC], b: BufReader) -> T_GC:
        return cls(b.read_g1(), b.read_g1())
