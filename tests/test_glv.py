"""GLV endomorphism decomposition (ops.glv) and the dual-table ladder kernel.

The decomposition feeds the flagship Pallas MSM kernel; its invariants
(|k1| bounds, sign structure) are load-bearing for the kernel's
doubling-free-add soundness proof, so they are asserted here explicitly.
"""
import random

import numpy as np
import pytest

from curdleproofs_tpu.fields import FR_MOD, Fr
from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.ops import glv
from curdleproofs_tpu.ops.fieldspec import ints_to_limbs

rng = random.Random(29)


def _limbs_to_int(col):
    return sum(int(col[i]) << (16 * i) for i in range(len(col)))


EDGES = [
    0,
    1,
    2,
    7,
    FR_MOD - 1,
    FR_MOD - 2,
    FR_MOD - 7,
    glv.LAMBDA,
    glv.LAMBDA - 1,
    glv.LAMBDA + 1,
    glv.Z_ABS**2,
    (1 << 254) - 1,
    1 << 128,
    14 * glv.LAMBDA,
]


def test_lattice_identity():
    assert glv.LAMBDA**2 + glv.LAMBDA + 1 == FR_MOD


def test_beta_lambda_pairing():
    """phi(x, y) = (beta*x, y) must equal lambda * (x, y) on G1."""
    from curdleproofs_tpu.ops.fieldspec import FQ_SPEC

    q = FQ_SPEC.modulus
    assert pow(glv.BETA, 3, q) == 1 and glv.BETA != 1
    for _ in range(3):
        P = G1() * Fr(rng.randrange(1, FR_MOD))
        assert G1(P.x * glv.BETA % q, P.y) == P * Fr(glv.LAMBDA)


def test_decompose_matches_int_reference_and_invariants():
    ks = EDGES + [rng.randrange(FR_MOD) for _ in range(512)]
    s1, neg1, s2 = glv.decompose(np.asarray(ints_to_limbs(ks, 16)))
    for j, k in enumerate(ks):
        k1 = _limbs_to_int(s1[:, j]) * (-1 if neg1[j] else 1)
        k2 = _limbs_to_int(s2[:, j])
        rk1, rk2 = glv.decompose_int(k)
        assert (k1, k2) == (rk1, rk2)
        # reconstruction
        assert (k1 + k2 * glv.LAMBDA) % FR_MOD == k
        # kernel soundness invariants (pallas_g1._build_glv_ladder_kernel)
        assert abs(k1) < 1 << 129
        assert 0 <= k2 <= glv.LAMBDA
        if abs(k1) > glv.LAMBDA // 2 + 1:
            assert k1 > 0 and k2 == glv.LAMBDA  # clamped corner: positive k1


def test_decompose_rejects_nothing_valid():
    """Every canonical scalar decomposes (no assertion trips) — sweep a
    few structured families."""
    fams = [glv.LAMBDA * t % FR_MOD for t in range(1, 50)]
    fams += [(glv.LAMBDA + 1) * t % FR_MOD for t in range(1, 50)]
    s1, neg1, s2 = glv.decompose(np.asarray(ints_to_limbs(fams, 16)))
    for j, k in enumerate(fams):
        k1 = _limbs_to_int(s1[:, j]) * (-1 if neg1[j] else 1)
        k2 = _limbs_to_int(s2[:, j])
        assert (k1 + k2 * glv.LAMBDA) % FR_MOD == k


@pytest.mark.slow
def test_glv_kernel_interpret_matches_host(monkeypatch):
    """Dual-table ladder kernel (interpreter mode) vs exact host arithmetic,
    including identity points and edge scalars."""
    import jax.numpy as jnp

    from curdleproofs_tpu.ops import g1 as og
    from curdleproofs_tpu.ops import pallas_g1 as pg

    monkeypatch.setattr(pg, "_FORCE", "1")
    n = 128
    pts = [G1() * Fr(rng.randrange(1, FR_MOD)) for _ in range(n)]
    pts[3] = G1.identity()
    scs = [Fr(rng.randrange(FR_MOD)) for _ in range(n)]
    for i, e in enumerate(EDGES):
        scs[i] = Fr(e % FR_MOD)
    points = og.pack_points(pts)
    s1, neg1, s2 = glv.decompose(
        np.asarray(ints_to_limbs([s.v for s in scs], 16))
    )
    acc = pg.scalar_mul_glv(
        points, jnp.asarray(s1), jnp.asarray(neg1), jnp.asarray(s2)
    )
    got = og.jpoints_to_host(acc)
    assert got == [p * s for p, s in zip(pts, scs)]
