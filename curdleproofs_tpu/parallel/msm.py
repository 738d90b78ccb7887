"""Multi-device / multi-host sharded MSM.

Points and digits are sharded across the mesh's point axis; every device runs
the full local sort + prefix-scan + boundary-gather Pippenger pipeline on its
shard (ops.msm._window_partials), producing per-shard window partials
(one total + B-1 boundary prefix sums per window chunk — a few KB). Those are
combined by linearity:

    S_w = sum_shards [ (B-1) * total_shard  -  bsum_{shard, w} ]

so the only cross-device data movement is the gather of per-shard partials —
the TPU-native analog of the reference's absent distributed backend
(SURVEY.md §2.3, §5: "bucket-sum all-reduce suffices").

This module is exercised on a virtual 8-device CPU mesh in tests and by
__graft_entry__.dryrun_multichip; on hardware the same code runs over ICI
(single host) or ICI+DCN (jax.distributed multi-host).
"""
from __future__ import annotations

import functools
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.ops import g1 as og
from curdleproofs_tpu.ops import msm as omsm
from curdleproofs_tpu.ops import scan as oscan
from curdleproofs_tpu.ops.g1 import APoints, JPoints
from curdleproofs_tpu.parallel.mesh import make_mesh

FR_BITS = omsm.FR_BITS


def _shard_kernel(points: APoints, digits: jnp.ndarray, c: int):
    """Per-shard window partials, with a leading shard axis for gathering."""
    total, bsums = omsm._window_partials(points, digits, c)
    return total.x[None], total.y[None], total.z[None], bsums.x[None], bsums.y[None], bsums.z[None]


@functools.lru_cache(maxsize=None)
def _pippenger_shard_fn(mesh: Mesh, point_axis: str, c: int):
    """Jitted shard_map window-partial kernel, cached per (mesh, axis, c)."""
    pspec = APoints(P(None, point_axis), P(None, point_axis), P(point_axis))
    dspec = P(None, point_axis)
    out_spec = (
        P(point_axis, None),
        P(point_axis, None),
        P(point_axis, None),
        P(point_axis, None, None),
        P(point_axis, None, None),
        P(point_axis, None, None),
    )
    return jax.jit(
        shard_map(
            partial(_shard_kernel, c=c),
            mesh=mesh,
            in_specs=(pspec, dspec),
            out_specs=out_spec,
            check_vma=False,  # per-shard results intentionally not replicated
        )
    )


@functools.lru_cache(maxsize=None)
def _ladder_shard_fn(mesh: Mesh, point_axis: str, use_glv: bool):
    """Jitted shard_map ladder kernel, cached per (mesh, axis, engine) —
    rebuilding the closure per call would recompile on every invocation."""
    from curdleproofs_tpu.ops import pallas_g1

    out_spec = (P(point_axis, None), P(point_axis, None), P(point_axis, None))
    if use_glv:

        def kernel(px, py, pinf, ng, sa, sb):
            acc = pallas_g1.scalar_mul_glv(APoints(px, py, pinf), sa, ng, sb)
            r = oscan.tree_reduce_hybrid(acc)
            return r.x[None], r.y[None], r.z[None]

        in_specs = (
            P(None, point_axis),
            P(None, point_axis),
            P(point_axis),
            P(point_axis),
            P(None, point_axis),
            P(None, point_axis),
        )
    else:

        def kernel(px, py, pinf, sc):
            acc = og.scalar_mul(APoints(px, py, pinf), sc)
            r = oscan.tree_reduce_hybrid(acc)
            return r.x[None], r.y[None], r.z[None]

        in_specs = (
            P(None, point_axis),
            P(None, point_axis),
            P(point_axis),
            P(None, point_axis),
        )
    return jax.jit(
        shard_map(
            kernel,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=out_spec,
            check_vma=False,
        )
    )


def msm_sharded_ladder(
    bases: Sequence[G1],
    scalars: Sequence[Fr],
    mesh: Optional[Mesh] = None,
    point_axis: str = "shard",
) -> G1:
    """Point-sharded MSM over the production fused-ladder kernel.

    Each shard runs the whole GLV dual-table ladder + tree reduce on its
    local points; exactly ONE Jacobian point (288 B) per shard crosses the
    interconnect. This is the deployment path for large multi-chip MSMs —
    the per-window-partial variant (msm_sharded) is kept for the
    bucket-reduction collective pattern and as a second implementation for
    cross-checks. Results are bit-identical for any mesh shape (exact adds).
    """
    from curdleproofs_tpu.ops import pallas_g1

    if len(bases) != len(scalars):
        raise ValueError("msm length mismatch")
    if not bases:
        return G1.identity()
    mesh = mesh or make_mesh()
    D = mesh.shape[point_axis]

    # identical power-of-two local width per shard, >= one Pallas tile
    n = len(bases)
    local = 128
    while local * D < n:
        local *= 2
    m = local * D
    points = og.pack_points(list(bases) + [G1.identity()] * (m - n))
    scs = list(scalars) + [Fr(0)] * (m - n)

    if pallas_g1.enabled():
        from curdleproofs_tpu.ops import glv
        from curdleproofs_tpu.ops.fieldspec import ints_to_limbs

        import numpy as np

        sc16 = np.asarray(ints_to_limbs([s.v for s in scs], 16), dtype=np.uint32)
        s1, neg1, s2 = glv.decompose(sc16.astype(np.uint64))
        f = _ladder_shard_fn(mesh, point_axis, True)
        args = (
            points.x,
            points.y,
            points.inf,
            jnp.asarray(neg1),
            jnp.asarray(s1),
            jnp.asarray(s2),
        )
    else:
        f = _ladder_shard_fn(mesh, point_axis, False)
        args = (points.x, points.y, points.inf, og.pack_scalars(scs))

    rx, ry, rz = f(*args)
    # gathered shape is (shards, 24); host combine wants limb-major (24, D)
    partials = og.jpoints_to_host(JPoints(rx.T, ry.T, rz.T))
    acc = G1.identity()
    for p in partials:
        acc = acc + p
    return acc


def msm_sharded(
    bases: Sequence[G1],
    scalars: Sequence[Fr],
    mesh: Optional[Mesh] = None,
    c: Optional[int] = None,
    window_batch: Optional[int] = None,
    point_axis: str = "shard",
) -> G1:
    """MSM with the point dimension sharded across a device mesh."""
    if len(bases) != len(scalars):
        raise ValueError("msm length mismatch")
    if not bases:
        return G1.identity()
    mesh = mesh or make_mesh()
    D = mesh.shape[point_axis]

    # pad so each shard gets an identical power-of-two local width >= 32
    n = len(bases)
    local = 32
    while local * D < n:
        local *= 2
    m = local * D
    pts_host = list(bases) + [G1.identity()] * (m - n)
    scs_host = list(scalars) + [Fr(0)] * (m - n)
    points = og.pack_points(pts_host)
    scalars_l = og.pack_scalars(scs_host)

    c = c or omsm.pick_window(local)
    W = -(-FR_BITS // c)
    if window_batch is None:
        window_batch = max(1, min(W, (1 << 21) // max(local, 1)))
    digits = omsm.extract_digits(scalars_l, c)

    kernel = _pippenger_shard_fn(mesh, point_axis, c)

    totals_host: List[G1] = []
    bsums_host: List[List[G1]] = []  # [shard][window]
    for w0 in range(0, W, window_batch):
        chunk = digits[w0 : w0 + window_batch]
        if chunk.shape[0] != window_batch:
            pad = jnp.zeros((window_batch - chunk.shape[0], m), dtype=chunk.dtype)
            chunk = jnp.concatenate([chunk, pad], axis=0)
        tx, ty, tz, bx, by, bz = kernel(points, chunk)
        if not totals_host:
            for s in range(D):
                totals_host.append(
                    og.jpoints_to_host(JPoints(tx[s], ty[s], tz[s]))[0]
                )
            bsums_host = [[] for _ in range(D)]
        for s in range(D):
            bsums_host[s].extend(og.jpoints_to_host(JPoints(bx[s], by[s], bz[s])))

    # combine by linearity: S_w = sum_s ((B-1) * total_s - bsum_{s,w})
    B = 1 << c
    big = [t * Fr(B - 1) for t in totals_host]
    wins: List[G1] = []
    for w in range(W):
        acc = G1.identity()
        for s in range(D):
            acc = acc + (big[s] - bsums_host[s][w])
        wins.append(acc)

    # Horner over windows
    acc = G1.identity()
    for w in reversed(range(W)):
        for _ in range(c):
            acc = acc + acc
        acc = acc + wins[w]
    return acc
