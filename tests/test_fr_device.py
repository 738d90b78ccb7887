"""Vectorized Fr device ops vs exact host oracles."""
import random

from curdleproofs_tpu.fields import FR_MOD, Fr, fr_inner_product
from curdleproofs_tpu.models.ipa import get_verification_scalars_bitstring
from curdleproofs_tpu.ops import fr as ofr

rng = random.Random(0xF12)


def test_powers():
    b = Fr(rng.randrange(1, FR_MOD))
    for n in (1, 5, 16, 33):
        assert ofr.powers(b, n) == [b ** (i + 1) for i in range(n)]
    assert ofr.powers(b, 0) == []


def test_verification_scalars():
    for lg_n in (2, 4, 6):
        n = 1 << lg_n
        chals = [Fr(rng.randrange(1, FR_MOD)) for _ in range(lg_n)]
        bits = get_verification_scalars_bitstring(n, lg_n)
        expect = []
        for i in range(n):
            s = Fr(1)
            for j in bits[i]:
                s = s * chals[j]
            expect.append(s)
        assert ofr.verification_scalars_device(chals, n) == expect


def test_inner_product():
    for n in (1, 2, 7, 16):
        a = [Fr(rng.randrange(FR_MOD)) for _ in range(n)]
        b = [Fr(rng.randrange(FR_MOD)) for _ in range(n)]
        assert ofr.inner_product(a, b) == fr_inner_product(a, b)
    assert ofr.inner_product([], []) == Fr(0)
