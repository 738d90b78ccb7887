"""Pallas fused point-op kernels, run in interpreter mode on CPU.

Marked slow: interpreting the ~8k-op fused kernel takes minutes on CPU. Run
with `pytest -m slow` (the TPU bench exercises the compiled path on every
round; this is the portable correctness check)."""
import random

import jax
import pytest

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import FR_MOD, Fr
from curdleproofs_tpu.ops import g1 as og
from curdleproofs_tpu.ops import pallas_g1 as pg

rng = random.Random(17)


@pytest.mark.slow
def test_pallas_jadd_jdbl_interpret(monkeypatch):
    monkeypatch.setattr(pg, "_FORCE", "1")
    n = pg.BLK
    pts = [G1() * Fr(rng.randrange(1, FR_MOD)) for _ in range(n)]
    qts = [G1() * Fr(rng.randrange(1, FR_MOD)) for _ in range(n)]
    # edge cases: identity on both sides, doubling, cancellation
    pts[0] = G1.identity()
    qts[1] = G1.identity()
    qts[2] = pts[2]
    qts[3] = -pts[3]
    jp, jq = og.lift(og.pack_points(pts)), og.lift(og.pack_points(qts))

    got = og.jpoints_to_host(jax.jit(pg.jadd)(jp, jq))
    assert got == [p + q for p, q in zip(pts, qts)]

    got2 = og.jpoints_to_host(jax.jit(pg.jdbl)(jp))
    assert got2 == [p + p for p in pts]

    aq = og.pack_points(qts)
    got3 = og.jpoints_to_host(jax.jit(pg.jmadd)(jp, aq))
    assert got3 == [p + q for p, q in zip(pts, qts)]
