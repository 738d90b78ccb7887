"""Tests for the Beneš/Hall 3-stage permutation routing solver.

The routed gather replaces the direct one-hot MXU gather (quadratic MACs)
in the host-sorted Pippenger MSM; correctness = the three local gathers
compose to the requested permutation. Reference analog: the gather feeds
the sorted-order bucket accumulation replacing the naive MSM loop
(msm_accumulator.py:6-12 in the reference).
"""
import numpy as np
import pytest

from curdleproofs_tpu.ops import route


def _simulate(r, c, i1, i2, i3, inp):
    """Apply the three local gathers exactly as documented in decompose()."""
    s1 = inp.reshape(r, c)[np.arange(r)[:, None], i1]
    s2 = s1[i2, np.arange(c)[:, None]]
    s3 = s2[i3, np.arange(r)[:, None]]
    return s3.reshape(-1)


@pytest.mark.parametrize("r,c", [(2, 2), (8, 4), (16, 16), (128, 128)])
def test_decompose_py_routes_permutations(r, c):
    n = r * c
    rng = np.random.default_rng(r * 1000 + c)
    src = np.stack([rng.permutation(n) for _ in range(3)]).astype(np.int32)
    i1, i2, i3 = route.decompose_py(r, c, src)
    for w in range(src.shape[0]):
        inp = np.arange(n, dtype=np.int64) * 7 + 3
        out = _simulate(r, c, i1[w], i2[w], i3[w], inp)
        assert np.array_equal(out, inp[src[w]])


@pytest.mark.parametrize("r,c", [(8, 4), (128, 128), (512, 128)])
def test_native_matches_python_twin(r, c):
    if not route.native_available():
        pytest.skip("native routing extension not built")
    n = r * c
    rng = np.random.default_rng(n)
    src = np.stack([rng.permutation(n) for _ in range(2)]).astype(np.int32)
    i1, i2, i3 = route.decompose(r, c, src)
    for w in range(src.shape[0]):
        inp = rng.integers(0, 1 << 30, n)
        out = _simulate(r, c, i1[w], i2[w], i3[w], inp)
        assert np.array_equal(out, inp[src[w]])
    # Local index ranges: every idx is a within-row / within-column index.
    assert i1.min() >= 0 and i1.max() < c
    assert i2.min() >= 0 and i2.max() < r
    assert i3.min() >= 0 and i3.max() < c
    # Stage-2 table rows must each be a permutation-free gather but stage 1/3
    # must be true within-row permutations (each row uses every column once).
    for w in range(src.shape[0]):
        assert all(len(set(row)) == c for row in i1[w])
        assert all(len(set(row)) == c for row in i3[w])


def test_identity_and_reverse():
    r, c = 16, 8
    n = r * c
    ident = np.arange(n, dtype=np.int32)[None]
    rev = ident[:, ::-1].copy()
    for src in (ident, rev):
        i1, i2, i3 = route.decompose_py(r, c, src)
        inp = np.arange(n, dtype=np.int64)
        assert np.array_equal(_simulate(r, c, i1[0], i2[0], i3[0], inp), inp[src[0]])


def test_pick_rc_bounds():
    r, c = route.pick_rc(1 << 16)
    assert r * c == 1 << 16 and r >= 128 and c >= 128
    with pytest.raises(ValueError):
        route.pick_rc(1 << 10)
    with pytest.raises(ValueError):
        route.pick_rc((1 << 16) - 1)
