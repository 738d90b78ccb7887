"""Sharded MSM on the virtual 8-device CPU mesh: results must be identical
to the single-device engine and the exact host oracle regardless of mesh
shape (field adds are exact — no floating-point reduction-order hazards)."""
import random

import jax
import pytest

from curdleproofs_tpu.curve import G1, msm_host
from curdleproofs_tpu.fields import FR_MOD, Fr
from curdleproofs_tpu.parallel.mesh import make_mesh
from curdleproofs_tpu.parallel.msm import msm_sharded

rng = random.Random(0x5A5A)


def rand_points(n):
    return [G1() * Fr(rng.randrange(1, FR_MOD)) for _ in range(n)]


def rand_scalars(n):
    return [Fr(rng.randrange(FR_MOD)) for _ in range(n)]


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_msm_matches_oracle(n_dev):
    n = 96  # not a multiple of shards * 32 -> exercises padding
    pts, scs = rand_points(n), rand_scalars(n)
    pts[0] = G1.identity()
    scs[1] = Fr(0)
    mesh = make_mesh(n_dev)
    got = msm_sharded(pts, scs, mesh=mesh, c=4)
    assert got == msm_host(pts, scs)


def test_sharded_msm_shard_invariance():
    n = 64
    pts, scs = rand_points(n), rand_scalars(n)
    expect = msm_host(pts, scs)
    for n_dev in (1, 2, 4):
        got = msm_sharded(pts, scs, mesh=make_mesh(n_dev), c=4)
        assert got == expect, f"mesh={n_dev}"


@pytest.mark.parametrize("d", [2, 4])
def test_sharded_stream_matches_oracle(d):
    """Streaming pipeline per shard + in-graph collective window combine."""
    from curdleproofs_tpu.parallel.msm import msm_sharded_stream

    n = 32 * d + 5  # padding exercised
    pts, scs = rand_points(n), rand_scalars(n)
    pts[2] = G1.identity()
    scs[3] = Fr(0)
    mesh = make_mesh(d)
    got = msm_sharded_stream(pts, scs, mesh=mesh, c=4)
    assert got == msm_host(pts, scs)


@pytest.mark.parametrize("d", [2, 8])
def test_sharded_ladder_matches_oracle(d):
    from curdleproofs_tpu.parallel.msm import msm_sharded_ladder

    rng = random.Random(5150)
    n = 16 * d + 3  # non-multiple of shard count; padding handles it
    pts = [G1() * Fr(rng.randrange(1, FR_MOD)) for _ in range(n - 1)]
    pts.append(G1.identity())
    scs = [Fr(rng.randrange(FR_MOD)) for _ in range(n - 1)] + [Fr(0)]
    mesh = make_mesh(d)
    assert msm_sharded_ladder(pts, scs, mesh=mesh) == msm_host(pts, scs)


@pytest.mark.parametrize("d", [2, 4])
def test_sharded_stream_sel_production_path(monkeypatch, d):
    """The PRODUCTION sharded stream path (per-shard GLV + routed gather +
    flagged sel scan, shared with the unsharded engine) forced on at small
    size, vs the host oracle and shard-count invariance."""
    from curdleproofs_tpu.ops import msm as omsm
    from curdleproofs_tpu.ops import stream_scan as ostream
    from curdleproofs_tpu.parallel import msm as pmsm
    from curdleproofs_tpu.parallel.msm import msm_sharded_stream

    monkeypatch.setattr(omsm, "ROUTE_MIN_N", 64)
    monkeypatch.setattr(omsm, "ROUTE_MIN_FACTOR", 8)
    monkeypatch.setattr(ostream, "_LANES", 32)
    n = d * 120  # pads to local=128 per shard -> 256 GLV lanes
    pts, scs = rand_points(n), rand_scalars(n)
    pts[0] = G1.identity()
    scs[1] = Fr(0)
    want = msm_host(pts, scs)

    calls = {"sel": 0}
    orig = pmsm._sharded_stream_sel

    def spy(*a, **k):
        calls["sel"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pmsm, "_sharded_stream_sel", spy)
    got = msm_sharded_stream(pts, scs, mesh=make_mesh(d), c=8)
    assert got == want
    assert calls["sel"] == 1, "production sel path must engage"
