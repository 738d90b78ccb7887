"""Multi-scalar multiplication engine (TPU-first Pippenger).

Replaces the reference's naive serial loop (msm_accumulator.py:6-12) — the #1
performance gap called out in SURVEY.md §2 — with a dense, scatter-free
Pippenger variant designed for TPU vector units:

For each c-bit window w with digits d_i and buckets t in [0, 2^c):
    S_w = sum_i d_i * P_i = sum_t t * bucket_t
Sorting lanes by digit makes every bucket a contiguous segment, so with the
inclusive group-prefix-scan P (ops.scan) and boundary indices
e_t = (last sorted lane with digit <= t):
    S_w = (B-1) * total  -  sum_{t=0}^{B-2} P[e_t]
which needs only: one argsort + gather, ~2n batched group adds (scan), a
(B-1)-wide gather via searchsorted, and one tree-reduce. No scatter, no
data-dependent shapes, no bucket-occupancy assumptions — exact for any input
including repeated digits, zero scalars and infinity points.

Windows are vmapped in chunks (window_batch) to trade HBM footprint against
parallelism. The final window combination (Horner over 2^c) is O(255) single
point ops, done on host in exact arithmetic.
"""
from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.ops import g1 as og
from curdleproofs_tpu.ops import scan as oscan
from curdleproofs_tpu.ops.g1 import APoints, JPoints

FR_BITS = 255


def extract_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(16, n) canonical Fr limbs -> (W, n) c-bit window digits (c <= 16)."""
    if not 1 <= c <= 16:
        raise ValueError("window size must be in [1, 16]")
    W = -(-FR_BITS // c)
    pad = jnp.zeros((2,) + scalars.shape[1:], dtype=scalars.dtype)
    s = jnp.concatenate([scalars, pad], axis=0)
    mask = jnp.uint32((1 << c) - 1)
    rows = []
    for w in range(W):
        b0 = w * c
        i0, off = divmod(b0, 16)
        v = s[i0] >> jnp.uint32(off)
        if off + c > 16:
            v = v | (s[i0 + 1] << jnp.uint32(16 - off))
        rows.append(v & mask)
    return jnp.stack(rows)


def _window_partials(points: APoints, digits: jnp.ndarray, c: int):
    """Per-window bucket-weighted sums for a chunk of windows.

    points: (24, n) affine; digits: (wb, n) -> returns (scan_total (24,),
    boundary_sums JPoints (24, wb)); caller assembles S_w on host.
    """
    B = 1 << c
    order = jnp.argsort(digits, axis=-1)  # (wb, n)
    sd = jnp.take_along_axis(digits, order, axis=-1)
    px = points.x[:, order]  # (24, wb, n)
    py = points.y[:, order]
    pinf = points.inf[order]
    jp = og.lift(APoints(px, py, pinf))
    P = oscan.inclusive_scan(jp)  # (24, wb, n) prefix sums

    ts = jnp.arange(B - 1, dtype=digits.dtype)  # buckets 0..B-2
    e = jax.vmap(lambda row: jnp.searchsorted(row, ts, side="right"))(sd) - 1
    mask = e >= 0  # (wb, B-1)
    eg = jnp.clip(e, 0, None)
    bx = jnp.take_along_axis(P.x, eg[None, :, :], axis=-1)
    by = jnp.take_along_axis(P.y, eg[None, :, :], axis=-1)
    bz = jnp.take_along_axis(P.z, eg[None, :, :], axis=-1)
    boundary = og.jselect(mask, JPoints(bx, by, bz), oscan.jinf(e.shape))
    bsums = oscan.tree_reduce_hybrid(boundary)  # (24, wb)
    total = JPoints(P.x[:, 0, -1], P.y[:, 0, -1], P.z[:, 0, -1])  # (24,)
    return total, bsums


@partial(jax.jit, static_argnames=("c",))
def _pippenger_device(points: APoints, digits: jnp.ndarray, c: int):
    return _window_partials(points, digits, c)


def _combine_windows_host(
    total: G1, bsums: List[G1], c: int, num_windows: int
) -> G1:
    """S = sum_w 2^{cw} * ((B-1)*total - bsums[w]), Horner, exact host math."""
    B = 1 << c
    big = total * Fr(B - 1)
    wins = [big - s for s in bsums]
    acc = G1.identity()
    for w in reversed(range(num_windows)):
        for _ in range(c):
            acc = acc + acc
        acc = acc + wins[w]
    return acc


def pick_window(n: int) -> int:
    """Window size balancing scan work (2n per window) vs bucket reduce.

    For the GLV-split stream engine W = ceil(130/c), so c = 13 (W = 10)
    beats c = 12 (W = 11) on every per-window cost — measured 0.39 s vs
    0.46 s at n = 2^16 — and c = 15 (W = 9) wins once n amortizes the
    2^15-bucket boundary tables."""
    if n <= 32:
        return 4
    if n <= 1024:
        return 8
    if n <= 1 << 16:
        return 13
    return 15


def _pad_pow2_inputs(points: APoints, scalars: jnp.ndarray, min_width: int = 32):
    """Pad to a power of two (>= min_width) so kernels compile for a small,
    reusable set of shapes; identity bases / zero scalars are no-ops."""
    n = points.x.shape[-1]
    m = min_width
    while m < n:
        m *= 2
    if m == n:
        return points, scalars
    zpad = jnp.zeros((points.x.shape[0], m - n), dtype=points.x.dtype)
    spad = jnp.zeros((scalars.shape[0], m - n), dtype=scalars.dtype)
    return (
        APoints(
            jnp.concatenate([points.x, zpad], axis=-1),
            jnp.concatenate([points.y, zpad], axis=-1),
            jnp.concatenate([points.inf, jnp.ones(m - n, dtype=bool)], axis=-1),
        ),
        jnp.concatenate([scalars, spad], axis=-1),
    )


def msm_pippenger(
    points: APoints,
    scalars: jnp.ndarray,
    c: Optional[int] = None,
    window_batch: Optional[int] = None,
) -> G1:
    """Full MSM: points (24, n) affine, scalars (16, n) canonical -> host G1."""
    from curdleproofs_tpu.utils.profiling import timed

    n_in = points.x.shape[-1]
    c_est = c or pick_window(max(n_in, 32))
    W_est = -(-FR_BITS // c_est)
    with timed(
        "msm.pippenger",
        items=n_in,
        point_ops=W_est * (2 * n_in + (1 << c_est)) + 255,
    ):
        return _msm_pippenger_impl(points, scalars, c, window_batch)


def _msm_pippenger_impl(
    points: APoints,
    scalars: jnp.ndarray,
    c: Optional[int] = None,
    window_batch: Optional[int] = None,
) -> G1:
    points, scalars = _pad_pow2_inputs(points, scalars)
    n = points.x.shape[-1]
    c = c or pick_window(n)
    W = -(-FR_BITS // c)
    if window_batch is None:
        # bound the (24, wb, n) x 3-coord x scan-level working set to ~2 GB
        window_batch = max(1, min(W, (1 << 21) // max(n, 1)))
    digits = extract_digits(scalars, c)
    total_host: Optional[G1] = None
    bsums_host: List[G1] = []
    for w0 in range(0, W, window_batch):
        chunk = digits[w0 : w0 + window_batch]
        if chunk.shape[0] != window_batch:  # keep a single compiled shape
            pad = jnp.zeros((window_batch - chunk.shape[0], n), dtype=chunk.dtype)
            chunk = jnp.concatenate([chunk, pad], axis=0)
        total, bsums = _pippenger_device(points, chunk, c)
        if total_host is None:
            total_host = og.jpoints_to_host(total)[0]
        bsums_host.extend(og.jpoints_to_host(bsums))
    return _combine_windows_host(total_host, bsums_host[:W], c, W)


# ---------------------------------------------------------------------------
# Host-sorted Pippenger: the production large-n path on TPU.
#
# The sort-based device Pippenger above is exact but bottlenecked by XLA's
# argsort/take_along_axis lowering on TPU (serial lane gathers; ~200x the add
# work at n=2^16 — ROADMAP item 1). This variant splits the work by what each
# processor is good at:
#   * HOST (numpy): digit extraction, per-window argsort (radix on uint16),
#     bucket-boundary searchsorted — O(W*n) integer work, milliseconds.
#   * DEVICE: the actual group arithmetic — gathering point records into
#     digit-sorted order with the one-hot MXU matmul kernel (ops.gather),
#     the 2n-add prefix scan per window (fused Pallas adds), boundary prefix
#     extraction (same MXU gather), and the bucket-sum reduction.
# Executed group work: W*(2n + B) adds vs the fused ladder's ~228n — ~5x
# fewer at c=12/n=2^16 — with every add still running in the fused kernels.
# ---------------------------------------------------------------------------


def host_digits(scalars: np.ndarray, c: int, bits: int = FR_BITS) -> np.ndarray:
    """numpy twin of extract_digits: (L16, n) limbs -> (W, n) uint16 digits
    with W = ceil(bits / c) (bits < 16 * rows(scalars) + 1)."""
    if not 1 <= c <= 16:
        raise ValueError("window size must be in [1, 16]")
    W = -(-bits // c)
    s = np.concatenate(
        [scalars.astype(np.uint32), np.zeros((2,) + scalars.shape[1:], np.uint32)]
    )
    mask = np.uint32((1 << c) - 1)
    rows = []
    for w in range(W):
        i0, off = divmod(w * c, 16)
        v = s[i0] >> np.uint32(off)
        if off + c > 16:
            v = v | (s[i0 + 1] << np.uint32(16 - off))
        rows.append(v & mask)
    return np.stack(rows).astype(np.uint16)


@partial(jax.jit, static_argnames=("c",))
def _hostsort_window_partials(packed, order, e, mask, c: int):
    """Device pipeline for one window chunk, all inside a single dispatch.

    packed (49, n) u32 point records (x limbs 0-23, y limbs 24-47, inf 48);
    order (wb, n) i32 digit-sort permutations; e (wb, B-1) i32 bucket
    boundary indices into the sorted order; mask (wb, B-1) boundary-valid.
    Returns (total JPoints (24,), bucket-weighted boundary sums (24, wb)).
    """
    from curdleproofs_tpu.ops import gather as ogather

    g = ogather.gather_u32_shared(packed, order, planes=2)  # (49, wb, n)
    pts = APoints(g[:24], g[24:48], g[48] != 0)
    P = oscan.inclusive_scan(og.lift(pts))  # (24, wb, n) prefix sums
    btab = jnp.concatenate([P.x, P.y, P.z], axis=0)  # (72, wb, n)
    bg = ogather.gather_u32(btab, e, planes=2)  # (72, wb, B-1)
    boundary = og.jselect(
        mask, JPoints(bg[:24], bg[24:48], bg[48:]), oscan.jinf(e.shape)
    )
    bsums = oscan.tree_reduce_hybrid(boundary)  # (24, wb)
    total = JPoints(P.x[:, 0, -1], P.y[:, 0, -1], P.z[:, 0, -1])
    return total, bsums


def hostsort_point_ops(n: int, c: int) -> int:
    """Group adds executed per MSM by the host-sorted Pippenger."""
    W = -(-FR_BITS // c)
    return W * (2 * n + (1 << c)) + 255


def msm_pippenger_hostsort(
    points: APoints,
    scalars: np.ndarray,
    c: Optional[int] = None,
    window_batch: Optional[int] = None,
) -> G1:
    """Full MSM: points (24, n) affine (device or host), scalars (16, n)
    canonical limbs as HOST numpy (the sort runs on host) -> host G1."""
    from curdleproofs_tpu.utils.profiling import timed

    scalars_np = np.asarray(scalars).astype(np.uint32)
    n_in = points.x.shape[-1]
    c = c or pick_window(max(n_in, 32))
    with timed(
        "msm.hostsort", items=n_in, point_ops=hostsort_point_ops(n_in, c)
    ):
        return _msm_hostsort_impl(points, scalars_np, c, window_batch)


def _msm_hostsort_impl(
    points: APoints,
    scalars_np: np.ndarray,
    c: int,
    window_batch: Optional[int] = None,
) -> G1:
    n_in = points.x.shape[-1]
    m = 512
    while m < n_in:
        m *= 2
    if m != n_in:  # pad with identity/zero lanes to a power of two >= 512
        zc = jnp.zeros((24, m - n_in), dtype=jnp.uint32)
        points = APoints(
            jnp.concatenate([points.x, zc], axis=-1),
            jnp.concatenate([points.y, zc], axis=-1),
            jnp.concatenate(
                [points.inf, jnp.ones(m - n_in, dtype=bool)], axis=-1
            ),
        )
        scalars_np = np.concatenate(
            [scalars_np, np.zeros((16, m - n_in), np.uint32)], axis=-1
        )
    n = m
    W = -(-FR_BITS // c)
    B = 1 << c
    if window_batch is None:
        # bound the scan working set (~600 u32 rows per lane live) to ~1.5 GB
        window_batch = max(1, min(W, (1 << 22) // max(n, 1)))

    # --- host: digits, per-window radix argsort, bucket boundaries ---------
    digits = host_digits(scalars_np, c)  # (W, n) uint16
    order = np.argsort(digits, axis=-1, kind="stable").astype(np.int32)
    sd = np.take_along_axis(digits, order.astype(np.intp), axis=-1)
    ts = np.arange(B - 1, dtype=np.uint16)
    e = np.empty((W, B - 1), np.int32)
    for w in range(W):
        e[w] = np.searchsorted(sd[w], ts, side="right").astype(np.int32) - 1
    mask = e >= 0

    packed = jnp.concatenate(
        [points.x, points.y, points.inf[None].astype(jnp.uint32)], axis=0
    )

    pending = []
    for w0 in range(0, W, window_batch):
        ordc = order[w0 : w0 + window_batch]
        ec = e[w0 : w0 + window_batch]
        mc = mask[w0 : w0 + window_batch]
        wb = ordc.shape[0]
        if wb != window_batch:  # keep a single compiled shape per (n, c)
            pad = window_batch - wb
            ordc = np.concatenate([ordc, np.zeros((pad, n), np.int32)])
            ec = np.concatenate([ec, np.zeros((pad, B - 1), np.int32)])
            mc = np.concatenate([mc, np.zeros((pad, B - 1), bool)])
        total, bsums = _hostsort_window_partials(
            packed, jnp.asarray(ordc), jnp.asarray(ec), jnp.asarray(mc), c
        )
        pending.append((total, bsums))
    xs = [pending[0][0].x] + [b.x for _, b in pending]
    ys = [pending[0][0].y] + [b.y for _, b in pending]
    zs = [pending[0][0].z] + [b.z for _, b in pending]
    arr = np.asarray(_pack_stream_results(tuple(xs), tuple(ys), tuple(zs)))
    pts = og.jpoints_to_host(JPoints(arr[:24], arr[24:48], arr[48:]))
    return _combine_windows_host(pts[0], pts[1 : 1 + W], c, W)


# ---------------------------------------------------------------------------
# Streaming host-sorted Pippenger ("stream"): hostsort with the prefix scan,
# boundary extraction and (optionally) bucket reduction restructured around
# the ops.stream_scan column-major streaming kernel — n work-optimal MIXED
# adds per window in ONE Pallas dispatch instead of ~2.2n full adds across
# ~35 dispatches, and only the B-1 bucket-boundary prefixes are ever
# stitched together (local + lane-offset add), never a full prefix vector.
# ---------------------------------------------------------------------------


# GLV endomorphism split inside the stream engine (see _msm_stream_impl):
# halves the window count for the same scan work. Default on; kill switch
# for A/B measurement and for exercising the non-split path in tests.
STREAM_GLV = os.environ.get("CURDLEPROOFS_STREAM_GLV", "1") == "1"
GLV_STREAM_MIN_N = 128  # below this, decompose/packing overhead dominates


def stream_point_ops(n: int, c: int) -> int:
    """Group adds executed per MSM by the streaming host-sorted Pippenger:
    one mixed add per record + ~2 log2(L)*L lane-offset adds + 2(B-1)
    boundary/reduce adds per window, + the host window combine. With the
    GLV split the records double (2n lanes) but W halves."""
    from curdleproofs_tpu.ops.stream_scan import pick_lanes

    m = 128
    while m < n:
        m *= 2
    if STREAM_GLV and m >= GLV_STREAM_MIN_N:
        W = -(-130 // c)
        n_eff = 2 * m
    else:
        W = -(-FR_BITS // c)
        n_eff = m
    L = pick_lanes(n_eff)
    return W * (n_eff + 2 * L.bit_length() * L + 2 * (1 << c)) + W * c + W


@jax.jit
def _glv_stream_packed(px, py, pinf, neg1):
    """Lane-doubled stream records for the GLV split: [sgn(neg1)·P | phi(P)]
    with phi(x, y) = (beta·x, y) and sgn negating y where s1 was negative.
    (24, n) Montgomery affine coords -> (49, 2n) packed records. Identity
    lanes ride on the inf flag (their 0-coords map to 0 under both ops)."""
    from curdleproofs_tpu.ops import modarith as ma
    from curdleproofs_tpu.ops.fieldspec import FQ_SPEC
    from curdleproofs_tpu.ops.pallas_g1 import _beta_mont_limbs

    beta = jnp.broadcast_to(
        jnp.asarray(_beta_mont_limbs(), dtype=jnp.uint32).reshape(24, 1), px.shape
    )
    y1 = ma.select(neg1, ma.neg(FQ_SPEC, py), py)
    x2 = ma.mont_mul(FQ_SPEC, px, beta)
    infu = pinf[None].astype(jnp.uint32)
    return jnp.concatenate(
        [
            jnp.concatenate([px, y1, infu], axis=0),
            jnp.concatenate([x2, py, infu], axis=0),
        ],
        axis=1,
    )


@partial(jax.jit, static_argnames=("T", "L"))
def _stream_window_partials(packed, idx_cm, bidx, lidx, T: int, L: int):
    """Device pipeline for one window chunk (single dispatch graph).

    packed (49, n) u32 point records; idx_cm (wb, n) i32 column-major
    digit-sort gather order; bidx (wb, B-1) i32 within-window flat positions
    (t*L + l) of bucket-boundary prefixes, -1 for empty; lidx (wb, B-1) i32
    within-window lane-offset positions (lane(e) - 1), -1 when lane(e) == 0
    or the boundary is empty. Out-of-range gathers return zeros, and an
    all-zero Jacobian triple has z == 0 == infinity, so no masking is needed
    anywhere. Returns (total JPoints (24,), bucket-weighted boundary sums
    (24, wb))."""
    from curdleproofs_tpu.ops import gather as ogather

    g = ogather.gather_u32_shared(packed, idx_cm, planes=2)  # (49, wb, n)
    return _stream_tail(g, bidx, lidx, T, L)


@partial(jax.jit, static_argnames=("T", "L"))
def _stream_window_partials_routed(packed, i1, i2, i3, bidx, lidx, T: int, L: int):
    """_stream_window_partials with the sorted-order gather replaced by the
    3-stage routed gather (ops.route + ops.gather.routed_gather): the
    column-major sort permutation arrives pre-factored as within-row /
    within-column local index tables, cutting the gather MACs ~(n/(2c+r))x.
    """
    from curdleproofs_tpu.ops import gather as ogather

    i1, i2, i3 = (a.astype(jnp.int32) for a in (i1, i2, i3))
    g = ogather.routed_gather(packed, i1, i2, i3, planes=2)  # (49, wb, n)
    return _stream_tail(g, bidx, lidx, T, L)


@partial(
    jax.jit,
    static_argnames=("T", "L", "S", "shapes", "pack", "cbits", "rbits",
                     "selpack", "bp16"),
)
def _stream_routed_sel_packed(
    packed, buf, T: int, L: int, S: int, shapes, pack: str,
    cbits: int = 8, rbits: int = 9, selpack: bool = False, bp16: bool = False,
):
    """_stream_window_partials_routed_sel with ALL index tables packed into
    ONE flat int16 host buffer — the axon tunnel charges ~30 ms fixed
    latency per host->device transfer (measured) and host->device traffic
    does NOT overlap device compute, so bytes are wall time. shapes is a
    static tuple of array shapes, decoded in order.

    Index packing (pack):
      "13":   route column factor c <= 256 — the stage-1/3 tables (entries
              < c) ride one byte each inside a shared int16 row; i2 (< r)
              rides a full int16. 4 B/record.
      "32":   all three stage tables packed into one int32 as
              i1 | i3 << cbits | i2 << 2*cbits (2*cbits + rbits <= 32,
              which holds whenever n * c <= 2^32) shipped as int16 pairs.
              4 B/record where the naive layout needs 6 — at n = 2^20 the
              index stream is the single largest transfer, so this is
              ~2 MB/window of wall time.
      "none": three int16 tables (6 B/record, only when neither fits).

    Table packing (independent of `pack`):
      selpack: sel lane ids ride a low byte + 9th-bit bitplane (L <= 512;
               9 + 1/16 bits/slot vs 16). Empty slots decode to lane 0 —
               harmless, since only bpos-referenced bsel slots are ever
               consumed downstream.
      bp16:    bpos rides ONE u16 per boundary instead of hi/lo int15
               halves (valid while T*S <= 65535; the empty sentinel T*S
               still gathers the zero triple)."""
    i1, i2, i3, sel, bpos, lidx = _decode_packed_tables(
        buf, shapes, pack, cbits, rbits, selpack, bp16
    )
    return _routed_sel_body(packed, i1, i2, i3, sel, bpos, lidx, T, L, S)


def _decode_packed_tables(
    buf, shapes, pack: str, cbits: int, rbits: int, selpack: bool, bp16: bool
):
    """In-graph decode of the flat int16 index buffer built by
    _pack_idx_chunk: returns (i1, i2, i3, sel, bpos, lidx) int32 arrays.
    Shared by the unsharded engine (_stream_routed_sel_packed) and the
    sharded shard_map kernel (parallel.msm), so both pay ONE host->device
    transfer per chunk."""
    arrs = []
    o = 0
    for shape in shapes:
        cnt = 1
        for d in shape:
            cnt *= d
        arrs.append(jax.lax.slice(buf, (o,), (o + cnt,)).reshape(shape))
        o += cnt

    def pop():
        return arrs.pop(0)

    if pack == "13":
        combo, i2 = pop(), pop()
        cb = jax.lax.bitcast_convert_type(combo, jnp.uint16).astype(jnp.int32)
        i1 = cb & 0xFF
        i3 = cb >> 8
    elif pack in ("13a", "13b"):
        # i2 low bytes ride int16 pairs ((wb, c, r/2) little-endian); the
        # 9th bit (r <= 512) rides a 16-lane bitplane. 3.0-3.1 B/record
        # where "13" ships 4.
        combo, i2lo = pop(), pop()
        i2hi = pop() if pack == "13b" else None
        cb = jax.lax.bitcast_convert_type(combo, jnp.uint16).astype(jnp.int32)
        i1 = cb & 0xFF
        i3 = cb >> 8
        wbv, cdim, rhalf = i2lo.shape
        v = jax.lax.bitcast_convert_type(i2lo, jnp.uint16).astype(jnp.int32)
        i2 = jnp.stack([v & 0xFF, v >> 8], axis=-1).reshape(
            wbv, cdim, 2 * rhalf
        )
        if pack == "13b":
            p = jax.lax.bitcast_convert_type(i2hi, jnp.uint16).astype(
                jnp.int32
            )
            rdim = 2 * rhalf
            bits = (
                jnp.repeat(p, 16, axis=-1)
                >> (jnp.arange(rdim, dtype=jnp.int32) % 16)
            ) & 1
            i2 = i2 | (bits << 8)
    elif pack == "32":
        combo = pop()
        # combo (wb, r, 2c) int16 pairs -> (wb, r, c) u32 words -> fields;
        # i2's (wb, c, r) layout was row-major-flattened into the word
        # stream on the host, so it reshapes back after extraction
        pairs = jax.lax.bitcast_convert_type(combo, jnp.uint16).reshape(
            combo.shape[0], combo.shape[1], combo.shape[2] // 2, 2
        )
        v = jax.lax.bitcast_convert_type(pairs, jnp.uint32)
        cmask = jnp.uint32((1 << cbits) - 1)
        i1 = (v & cmask).astype(jnp.int32)
        i3 = ((v >> jnp.uint32(cbits)) & cmask).astype(jnp.int32)
        i2 = (
            (v >> jnp.uint32(2 * cbits))
            .astype(jnp.int32)
            .reshape(v.shape[0], 1 << cbits, 1 << rbits)
        )
    else:
        i1, i2, i3 = pop(), pop(), pop()
    if selpack:
        sel_lo, sel_hi = pop(), pop()
        rows, shalf = sel_lo.shape
        v = jax.lax.bitcast_convert_type(sel_lo, jnp.uint16).astype(jnp.int32)
        sel = jnp.stack([v & 0xFF, v >> 8], axis=-1).reshape(rows, 2 * shalf)
        p = jax.lax.bitcast_convert_type(sel_hi, jnp.uint16).astype(jnp.int32)
        sdim = 2 * shalf
        bits = (
            jnp.repeat(p, 16, axis=-1)
            >> (jnp.arange(sdim, dtype=jnp.int32) % 16)
        ) & 1
        sel = sel | (bits << 8)
    else:
        sel = pop()
    if bp16:
        bpos = jax.lax.bitcast_convert_type(pop(), jnp.uint16).astype(
            jnp.int32
        )
    else:
        # bpos spans up to T*S (> u16 at S = 256, T = 256), so it rides as
        # hi/lo int15 halves; out-of-range values gather 0 (identity)
        bp_hi, bp_lo = pop(), pop()
        bpos = bp_hi.astype(jnp.int32) * 32768 + bp_lo.astype(jnp.int32)
    lidx = pop().astype(jnp.int32)
    return i1, i2, i3, sel, bpos, lidx


@partial(jax.jit, static_argnames=("T", "L", "S"))
def _stream_window_partials_routed_sel(
    packed, i1, i2, i3, sel, bpos, lidx, T: int, L: int, S: int
):
    return _routed_sel_body(packed, i1, i2, i3, sel, bpos, lidx, T, L, S)


def _routed_sel_body(packed, i1, i2, i3, sel, bpos, lidx, T: int, L: int, S: int):
    """Routed-gather streaming pipeline with in-kernel boundary selection:
    the scan kernel emits only the DISTINCT bucket-boundary prefixes (host-
    scheduled into (T, S) slots), never the full (72, wb, n) prefix vector —
    the dominant HBM write at large n. Duplicate boundaries (empty buckets —
    structural in the top window, where only the low digit bits vary) are
    resolved by `bpos`: a per-boundary gather from the COMPACT (T*S)-wide
    selected-prefix table, so a rank selected once can be consumed with any
    multiplicity. boundary = bsel[bpos] + lane_offset[lidx], then one tree
    reduce — same shape as the full-prefix tail, but the boundary gather
    runs over T*S (~8k) columns instead of n (~64k+)."""
    from curdleproofs_tpu.ops import gather as ogather
    from curdleproofs_tpu.ops import stream_scan as ostream

    wb = i1.shape[0]
    i1, i2, i3 = (a.astype(jnp.int32) for a in (i1, i2, i3))
    sel = sel.astype(jnp.int32)
    g = ogather.routed_gather(packed, i1, i2, i3, planes=2)  # (49, wb, n)
    bsel, totals, flags = ostream.scan_records_sel(
        g.reshape(49, wb * T * L), sel, wb, T, L, S
    )
    lane_scan = oscan._hs_scan(
        JPoints(totals[:24], totals[24:48], totals[48:])
    )  # (24, wb, L) inclusive over lanes
    total = JPoints(
        lane_scan.x[:, 0, L - 1], lane_scan.y[:, 0, L - 1], lane_scan.z[:, 0, L - 1]
    )
    lane_tab = jnp.concatenate([lane_scan.x, lane_scan.y, lane_scan.z], axis=0)
    bl = ogather.gather_u32(bsel, bpos, planes=2)  # (72, wb, B-1) local prefixes
    lo = ogather.gather_u32(lane_tab, lidx, planes=2)  # (72, wb, B-1) lane offsets
    boundary = og.jadd(
        JPoints(bl[:24], bl[24:48], bl[48:]), JPoints(lo[:24], lo[24:48], lo[48:])
    )
    bsums = oscan.tree_reduce_hybrid(boundary)  # (24, wb)
    return total, bsums, flags


# largest route column factor whose stage-1/3 indices fit a single byte
# (the "13" index packing); tests lower it to force the "32" packing.
PACK13_MAX_C = 256

# boundary-selection slot capacities per scan step, tried smallest first.
# DISTINCT ranks per cell have mean occupancy (B-1)/T (~32 at L=512, c=12,
# n=2^16 non-split; ~16 with the GLV split's doubled T; measured max 55 /
# 32 for uniform scalars). 128 is the Mosaic floor (the sel kernel's output
# block is (72, 1, S): last dim must be a multiple of 128), so 128 is the
# everyday shape; escalating to 256 rescues concentrated digit
# distributions that would previously have hit the full-prefix fallback.
# S only sizes the kernel output and the compact bpos gather —
# multiplicity lives in the bpos gather. Each S is a distinct compiled
# kernel shape, so the options list stays short.
SEL_SLOT_OPTIONS = (128, 256)
SEL_SLOTS = 128


def _build_sel(e: np.ndarray, T: int, S: int):
    """Schedule DISTINCT boundary ranks into per-step selection slots.

    A boundary at sorted rank e is only observable at scan step e % T (its
    offset inside its lane's block), so the step is forced; what we control
    is deduplication — empty buckets repeat the previous boundary rank
    (thousands of times in the top window, whose digits only span the
    leftover high bits), and scheduling each distinct rank ONCE keeps the
    per-cell occupancy near (B-1)/T. Multiplicity is reinstated downstream
    by the `bpos` gather from the compact selected-prefix table.

    e (W, B-1) int64 boundary ranks (-1 = empty prefix, contributes the
    identity). Returns (sel (W*T, S) int32 lane ids (-1 = empty slot),
    bpos (W, B-1) int32 per-boundary flat positions t*S + slot into the
    per-window (T*S) selected table, -1 for e < 0), or (None, None) if any
    (window, step) needs more than S slots."""
    W, Bm1 = e.shape
    sel = np.full((W * T, S), -1, np.int32)
    bpos = np.full((W, Bm1), -1, np.int32)
    for w in range(W):
        valid = e[w] >= 0
        ranks = e[w][valid].astype(np.int64)
        if ranks.size == 0:
            continue
        uniq, inv = np.unique(ranks, return_inverse=True)
        ut = uniq % T
        ul = (uniq // T).astype(np.int32)
        o = np.argsort(ut, kind="stable")
        ts = ut[o]
        starts = np.searchsorted(ts, np.arange(T))
        slot_sorted = np.arange(ts.size) - starts[ts]
        if slot_sorted.size and slot_sorted.max() >= S:
            return None, None
        slot = np.empty(ts.size, np.int64)
        slot[o] = slot_sorted
        sel[w * T + ut, slot] = ul
        bpos[w, valid] = (ut * S + slot).astype(np.int32)[inv]
    return sel, bpos


def _stream_tail(g, bidx, lidx, T: int, L: int):
    from curdleproofs_tpu.ops import gather as ogather
    from curdleproofs_tpu.ops import stream_scan as ostream

    wb = g.shape[1]
    prefix, totals = ostream.scan_records(g.reshape(49, wb * T * L), wb, T, L)
    lane_scan = oscan._hs_scan(
        JPoints(totals[:24], totals[24:48], totals[48:])
    )  # (24, wb, L) inclusive over lanes
    total = JPoints(
        lane_scan.x[:, 0, L - 1], lane_scan.y[:, 0, L - 1], lane_scan.z[:, 0, L - 1]
    )
    lane_tab = jnp.concatenate([lane_scan.x, lane_scan.y, lane_scan.z], axis=0)
    bl = ogather.gather_u32(prefix, bidx, planes=2)  # (72, wb, B-1) local prefixes
    lo = ogather.gather_u32(lane_tab, lidx, planes=2)  # (72, wb, B-1) lane offsets
    boundary = og.jadd(
        JPoints(bl[:24], bl[24:48], bl[48:]), JPoints(lo[:24], lo[24:48], lo[48:])
    )
    bsums = oscan.tree_reduce_hybrid(boundary)  # (24, wb)
    return total, bsums


# Routed (3-stage) sorted-order gather kicks in at this MSM width; below it
# the direct one-hot gather is cheap enough and the r/c factors would fall
# under Mosaic's 128-lane tile floor.
ROUTE_MIN_N = 1 << 14
ROUTE_MIN_FACTOR = 128


def stream_host_prep(digits: np.ndarray, c: int, L: int):
    """Host index prep for the streaming scan: digit-sort permutations in
    column-major device layout + bucket-boundary/lane-offset index tables.

    digits (W, n) uint16 -> (order_cm (W, n) i32, bidx (W, B-1) i32,
    lidx (W, B-1) i32, e (W, B-1) i64 raw boundary ranks)."""
    W, n = digits.shape
    T = n // L
    B = 1 << c
    order = np.argsort(digits, axis=-1, kind="stable").astype(np.int32)
    sd = np.take_along_axis(digits, order.astype(np.intp), axis=-1)
    ts = np.arange(B - 1, dtype=np.uint16)
    e = np.empty((W, B - 1), np.int64)
    for w in range(W):
        e[w] = np.searchsorted(sd[w], ts, side="right") - 1
    # column-major relabel: device flat position t*L + l holds sorted rank
    # l*T + t, so lane l's VMEM accumulator walks ranks [l*T, (l+1)*T)
    order_cm = np.ascontiguousarray(
        order.reshape(W, L, T).transpose(0, 2, 1)
    ).reshape(W, n)
    t_e, l_e = e % T, e // T
    bidx = np.where(e >= 0, t_e * L + l_e, -1).astype(np.int32)
    lidx = np.where((e >= 0) & (l_e > 0), l_e - 1, -1).astype(np.int32)
    return order_cm, bidx, lidx, e


@jax.jit
def _pack_stream_results(xs, ys, zs):
    """Concat ((24,) | (24, k)) coordinate groups into one (72, K) array so
    the stream tail materializes with a single host transfer."""

    def cat(parts):
        return jnp.concatenate([p.reshape(24, -1) for p in parts], axis=-1)

    return jnp.concatenate([cat(xs), cat(ys), cat(zs)], axis=0)


@jax.jit
def _pack_stream_results_flagged(xs, ys, zs, flags):
    """_pack_stream_results plus ONE trailing column whose first rows carry
    the per-window doubling flags (flags: tuple of (wb,) u32) — the flags
    ride home inside the same single readback."""
    f = jnp.concatenate([jnp.atleast_1d(fl) for fl in flags])
    col = jnp.zeros((72,), jnp.uint32).at[: f.shape[0]].set(f).reshape(72, 1)
    return jnp.concatenate([_pack_stream_results(xs, ys, zs), col], axis=-1)


_ROUTE_POOL = None


def _route_pool():
    """Shared route-solve thread pool (one per process, cpu_count workers).

    The solver is the host-CPU bottleneck of the stream engine; when big
    MSMs run as overlapped slices (STREAM_SPLIT) a per-slice pool would put
    2x the threads on the same 2 cores and thrash — a single global pool
    keeps solves at exactly one per core while slices still overlap their
    device work."""
    global _ROUTE_POOL
    if _ROUTE_POOL is None:
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        _ROUTE_POOL = ThreadPoolExecutor(
            max_workers=min(8, _os.cpu_count() or 1),
            thread_name_prefix="route-solve",
        )
    return _ROUTE_POOL


def _pack_idx_chunk(
    i1, i2, i3, sc_, bp_, lc, rr, rc, T: int, L: int, S: int,
    prepacked_idx=None,
):
    """Pack one window chunk's index tables into ONE flat int16 host buffer
    — one transfer per chunk instead of six. Returns
    (buf, shapes, pack, cbits, rbits, selpack, bp16); the device-side
    inverse is _decode_packed_tables. Shared by the unsharded engine and
    the sharded per-shard path (parallel.msm).

    prepacked_idx = (pack, idx_parts) skips the route-table packing: the
    native solver already emitted the wire format (route.decompose_packed)
    and i1/i2/i3 are ignored.

    bpos empty (-1) encodes as the out-of-range T*S (gathers the zero
    triple = identity)."""
    bp_enc = np.where(bp_ >= 0, bp_, T * S)
    cbits = rc.bit_length() - 1
    rbits = rr.bit_length() - 1
    if prepacked_idx is not None:
        pack, idx_parts = prepacked_idx
    elif rc <= PACK13_MAX_C and rr <= 512 and rr % 32 == 0:
        # stage-1/3 entries one byte each; i2 low byte +
        # (r > 256) a 9th-bit bitplane
        combo = (
            i1.astype(np.uint16) | (i3.astype(np.uint16) << 8)
        ).view(np.int16)
        lo = (i2 & 0xFF).astype(np.uint8)
        i2lo = np.ascontiguousarray(lo).view(np.int16)
        if rr > 256:
            pack = "13b"
            hb = (i2 >> 8).astype(np.uint16)
            hb16 = hb.reshape(hb.shape[0], hb.shape[1], -1, 16)
            plane = (
                hb16 << np.arange(16, dtype=np.uint16)
            ).sum(axis=-1, dtype=np.uint16).astype(np.uint16)
            idx_parts = (combo, i2lo, plane.view(np.int16))
        else:
            pack = "13a"
            idx_parts = (combo, i2lo)
    elif rc <= PACK13_MAX_C:  # odd r: plain int16 i2
        pack = "13"
        combo = (
            i1.astype(np.uint16) | (i3.astype(np.uint16) << 8)
        ).view(np.int16)
        idx_parts = (combo, i2)
    elif 2 * cbits + rbits <= 32:
        pack = "32"
        v = (
            i1.astype(np.uint32)
            | (i3.astype(np.uint32) << cbits)
            | (i2.reshape(i1.shape).astype(np.uint32) << (2 * cbits))
        )
        idx_parts = (np.ascontiguousarray(v).view(np.int16),)
    else:
        pack = "none"
        idx_parts = (i1, i2, i3)
    # sel: lane ids < L; empty (-1) -> lane 0 (only bpos-
    # referenced slots are consumed, so stray selections are
    # dead weight, not errors). L <= 512 -> low byte + 9th-bit
    # bitplane: 9.06 bits/slot instead of 16.
    selpack = L <= 512 and S % 32 == 0
    if selpack:
        se = np.where(sc_ >= 0, sc_, 0)
        slo = np.ascontiguousarray((se & 0xFF).astype(np.uint8)).view(np.int16)
        hb = (se >> 8).astype(np.uint16)
        hb16 = hb.reshape(hb.shape[0], -1, 16)
        shi = (
            (hb16 << np.arange(16, dtype=np.uint16))
            .sum(axis=-1, dtype=np.uint16)
            .view(np.int16)
        )
        sel_parts = (slo, shi)
    else:
        sel_parts = (sc_,)
    bp16 = T * S <= 65535
    if bp16:
        bp_parts = (bp_enc.astype(np.uint16).view(np.int16),)
    else:
        bp_parts = (
            (bp_enc >> 15).astype(np.int16),
            (bp_enc & 0x7FFF).astype(np.int16),
        )
    parts = idx_parts + sel_parts + bp_parts + (lc,)
    shapes = tuple(tuple(p.shape) for p in parts)
    buf = np.concatenate([p.astype(np.int16).ravel() for p in parts])
    return buf, shapes, pack, cbits, rbits, selpack, bp16


# Above this width one MSM runs as SLICES of this size plus one host add
# per extra slice: MSM is linear in its (point, scalar) pairs, and the
# monolithic pipeline degrades superlinearly past ~2^16 (route-solve cache
# behaviour ~n log n with growing miss rates, bucket tails and the
# boundary-prefix gather both grow with B, index transfers with n*W).
# Measured at n=2^20: 16 x 2^16 slices ≈ 6 s vs ~12-14 s monolithic.
# CURDLEPROOFS_STREAM_SPLIT=0 disables (monolithic run at the caller's c).
STREAM_SPLIT = int(os.environ.get("CURDLEPROOFS_STREAM_SPLIT", str(1 << 16)))


def msm_pippenger_stream(
    points: APoints,
    scalars: np.ndarray,
    c: Optional[int] = None,
    window_batch: Optional[int] = None,
    routed: Optional[bool] = None,
) -> G1:
    """Full MSM via the streaming host-sorted Pippenger. points (24, n)
    affine (device or host), scalars (16, n) canonical limbs as HOST numpy
    (the sort runs on host) -> host G1. Widths above STREAM_SPLIT run as
    independent slices at the tuned slice size (each slice re-picks its
    own window bits) combined by plain addition."""
    from curdleproofs_tpu.utils.profiling import timed

    scalars_np = np.asarray(scalars).astype(np.uint32)
    n_in = points.x.shape[-1]
    if STREAM_SPLIT and n_in > STREAM_SPLIT:
        sz = STREAM_SPLIT
        cs = pick_window(sz)
        with timed(
            "msm.stream",
            items=n_in,
            point_ops=-(-n_in // sz) * stream_point_ops(sz, cs),
        ):
            # two slices in flight: slice k+1's host prep (native sort +
            # route solves) overlaps slice k's device execution/readback;
            # the device serializes the actual compute either way
            from concurrent.futures import ThreadPoolExecutor

            def one(o):
                sub = APoints(
                    points.x[:, o : o + sz],
                    points.y[:, o : o + sz],
                    points.inf[o : o + sz],
                )
                return _msm_stream_impl(
                    sub, scalars_np[:, o : o + sz], cs, window_batch, routed
                )

            acc = G1.identity()
            with ThreadPoolExecutor(max_workers=2) as pool:
                for r in pool.map(one, range(0, n_in, sz)):
                    acc = acc + r
            return acc
    c = c or pick_window(max(n_in, 32))
    with timed("msm.stream", items=n_in, point_ops=stream_point_ops(n_in, c)):
        return _msm_stream_impl(points, scalars_np, c, window_batch, routed)


def _msm_stream_impl(
    points: APoints,
    scalars_np: np.ndarray,
    c: int,
    window_batch: Optional[int] = None,
    routed: Optional[bool] = None,
    _safe: bool = False,
) -> G1:
    from curdleproofs_tpu.ops.stream_scan import pick_lanes

    import time as _time

    _t0 = _time.perf_counter()
    _trace = bool(os.environ.get("CURDLEPROOFS_STREAM_TRACE"))
    points_in, scalars_in = points, scalars_np  # for the doubling-fallback

    def _dbg(tag):
        if _trace:
            print(f"[stream +{(_time.perf_counter() - _t0) * 1e3:7.1f}ms] {tag}")

    n_in = points.x.shape[-1]
    m = 128  # Mosaic lane-tile floor; production sizes use 512-lane tiles
    while m < n_in:
        m *= 2
    if m != n_in:  # pad with identity/zero lanes to a power of two
        zc = jnp.zeros((24, m - n_in), dtype=jnp.uint32)
        points = APoints(
            jnp.concatenate([points.x, zc], axis=-1),
            jnp.concatenate([points.y, zc], axis=-1),
            jnp.concatenate(
                [points.inf, jnp.ones(m - n_in, dtype=bool)], axis=-1
            ),
        )
        scalars_np = np.concatenate(
            [scalars_np, np.zeros((16, m - n_in), np.uint32)], axis=-1
        )
    n = m
    B = 1 << c
    # GLV endomorphism split (CURDLEPROOFS_STREAM_GLV=0 disables): each
    # 255-bit scalar becomes two <=129-bit halves k = (-1)^neg*s1 + s2*lam,
    # the lane set doubles to [+-P | phi(P)], and W halves (22 -> 11 at
    # c=12). Scan work is unchanged (W*n records either way) but every
    # per-window cost — bucket-boundary stitch, tree reduce, index-table
    # bytes, host window combine — halves with W.
    glv_split = STREAM_GLV and n >= GLV_STREAM_MIN_N
    if routed is None:
        routed = 2 * n >= ROUTE_MIN_N if glv_split else n >= ROUTE_MIN_N

    neg1 = None
    sel_all = bpos_all = None
    S = SEL_SLOTS
    native_prep = None
    if glv_split and not _safe:
        try:
            from curdleproofs_tpu import _g1_native

            native_prep = getattr(_g1_native, "msm_prep_batch", None)
        except ImportError:
            pass
    if native_prep is not None:
        # ONE native call: GLV split + digits + counting sort + boundary
        # ranks + column-major relabel + boundary-selection schedule
        # (C, OpenMP) — replaces ~100 ms of numpy on the critical path
        n2 = 2 * n
        L = pick_lanes(n2)
        T = n2 // L
        buf = np.ascontiguousarray(scalars_np.T.astype("<u2")).tobytes()
        nb, ob, bb, lb, sb_, pb, S_nat, W = native_prep(buf, c, L)
        neg1 = np.frombuffer(nb, np.uint8).astype(bool)
        order_cm = np.frombuffer(ob, np.int32).reshape(W, n2)
        bidx = np.frombuffer(bb, np.int32).reshape(W, B - 1)
        lidx = np.frombuffer(lb, np.int32).reshape(W, B - 1)
        if routed and S_nat:
            S = S_nat
            sel_all = np.frombuffer(sb_, np.int32).reshape(W * T, S)
            bpos_all = np.frombuffer(pb, np.int32).reshape(W, B - 1)
        n = n2
        _dbg(f"native prep (S={S if sel_all is not None else 0})")
    else:
        if glv_split:
            from curdleproofs_tpu.ops import glv as oglv

            s1, neg1, s2 = oglv.decompose(scalars_np.astype(np.uint64))
            _dbg("glv decompose")
            digits = host_digits(
                np.concatenate([s1, s2], axis=1).astype(np.uint32), c, bits=130
            )  # (ceil(130/c), 2n) — |s1| < 2^129 plus one bit of headroom
            n *= 2
        else:
            digits = host_digits(scalars_np, c)  # (W, n) uint16
        W = digits.shape[0]
        L = pick_lanes(n)
        T = n // L
        _dbg("digits")
        order_cm, bidx, lidx, e = stream_host_prep(digits, c, L)
        _dbg("argsort+prep")
        # in-kernel boundary selection (skips the full prefix write):
        # routed path only; S adapts to the smallest slot option that
        # fits, and falls back to the full-prefix path when even the
        # largest overflows. _safe forces the full-prefix path (the
        # doubling-complete kernel) — the fallback when the fast no-
        # doubling scan flagged a p == q collision.
        if routed and not _safe:
            for S in SEL_SLOT_OPTIONS:
                sel_all, bpos_all = _build_sel(e, T, S)
                if sel_all is not None:
                    break
        _dbg(f"build_sel (S={S if sel_all is not None else 0})")

    if window_batch is None:
        if routed:
            # uniform 2-window chunks: the round-5 tunnel moves host->device
            # data at ~1 GB/s with sub-ms fixed cost (micro_overlap.py), so
            # transfer batching no longer matters and the schedule is paced
            # by the 2-core route solver (~22 ms/window) — smaller chunks
            # dispatch device work as soon as each solve pair lands
            # (measured 0.252 s vs 0.323 s for 4-window chunks at 2^16)
            window_batch = 2
        else:
            # per-chunk live set: gathered records + full prefix table:
            # ~500 u32 rows per lane
            window_batch = max(1, min(W, (1 << 22) // max(n, 1)))
    if isinstance(window_batch, int):
        window_batch = [window_batch] * (-(-W // window_batch))
    schedule = list(window_batch)
    while sum(schedule[:-1]) >= W and len(schedule) > 1:
        schedule.pop()

    # route solves are the chunk-0 critical path (the 2-core bench host
    # works through them at ~2/step): submit them BEFORE the remaining
    # host prep so build_sel / packing / transfers overlap the solves
    route_futs = None
    if routed:
        # factor every window's sort permutation into 3-stage routing tables
        # on background threads (the native solver releases the GIL), one
        # future per window so solves overlap each other AND device work
        from curdleproofs_tpu.ops import route as oroute

        rr, rc = oroute.pick_rc(n, ROUTE_MIN_FACTOR)
        pool = _route_pool()
        ident = np.arange(n, dtype=np.int32)[None]  # pad rows: identity perm

        # packed output feeds the sel pipeline's wire buffer only; the
        # rare non-sel fallback consumes raw tables
        use_packed = oroute.packed_available(rr, rc) and sel_all is not None

        def solve(rows):
            # native packed output: the solver emits the '13a'/'13b'
            # transfer wire bytes directly, so neither the int32 fill
            # scatters nor the numpy packing passes touch the main thread
            if use_packed:
                return oroute.decompose_packed(rr, rc, rows)
            # int16 tables: local indices are < max(r, c) <= 2^15, and the
            # 16-bit transfer halves the dominant host->device traffic (the
            # kernels upcast on device)
            return tuple(
                a.astype(np.int16) for a in oroute.decompose(rr, rc, rows)
            )

        route_futs = [
            pool.submit(solve, order_cm[w : w + 1] if w < W else ident)
            for w in range(sum(schedule))
        ]

    if glv_split:
        packed = _glv_stream_packed(
            points.x, points.y, points.inf, jnp.asarray(neg1)
        )
    else:
        packed = jnp.concatenate(
            [points.x, points.y, points.inf[None].astype(jnp.uint32)], axis=0
        )

    pending = []  # (total, bsums) DEVICE handles; dispatches stay async so
    # chunk k+1's host prep/transfers overlap chunk k's device execution
    starts = [sum(schedule[:i]) for i in range(len(schedule))]
    for w0, cb in zip(starts, schedule):
        sl = slice(w0, w0 + cb)
        ordc, bc, lc = order_cm[sl], bidx[sl], lidx[sl]
        wb = ordc.shape[0]
        if wb != cb:  # keep one compiled shape per (n, c, chunk size)
            pad = cb - wb
            ordc = np.concatenate(
                [ordc, np.tile(np.arange(n, dtype=np.int32), (pad, 1))]
            )
            bc = np.concatenate([bc, np.full((pad, B - 1), -1, np.int32)])
            lc = np.concatenate([lc, np.full((pad, B - 1), -1, np.int32)])
        if routed:
            parts = [f.result() for f in route_futs[w0 : w0 + cb]]
            _dbg(f"chunk {w0}: solves ready")
            if parts and isinstance(parts[0][0], str):  # native packed
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
                i1 = np.concatenate([p[0] for p in parts])
                i2 = np.concatenate([p[1] for p in parts])
                i3 = np.concatenate([p[2] for p in parts])
            if sel_all is not None:
                sc_ = sel_all[w0 * T : (w0 + cb) * T]
                bp_ = bpos_all[sl]
                if sc_.shape[0] != cb * T:
                    sc_ = np.concatenate(
                        [
                            sc_,
                            np.full(
                                (cb * T - sc_.shape[0], S),
                                -1,
                                np.int32,
                            ),
                        ]
                    )
                    bp_ = np.concatenate(
                        [
                            bp_,
                            np.full(
                                (cb - bp_.shape[0], B - 1),
                                -1,
                                np.int32,
                            ),
                        ]
                    )
                buf, shapes, pack, cbits, rbits, selpack, bp16 = (
                    _pack_idx_chunk(
                        i1, i2, i3, sc_, bp_, lc, rr, rc, T, L, S,
                        prepacked_idx=prepacked,
                    )
                )
                _dbg(f"chunk {w0}: packed ({buf.nbytes >> 10} KB)")
                total, bsums, flags = _stream_routed_sel_packed(
                    packed, jnp.asarray(buf), T, L, S, shapes, pack,
                    cbits, rbits, selpack, bp16,
                )
                _dbg(f"chunk {w0}: dispatched")
            else:
                total, bsums = _stream_window_partials_routed(
                    packed,
                    jnp.asarray(i1),
                    jnp.asarray(i2),
                    jnp.asarray(i3),
                    jnp.asarray(bc),
                    jnp.asarray(lc),
                    T,
                    L,
                )
                flags = None
        else:
            total, bsums = _stream_window_partials(
                packed, jnp.asarray(ordc), jnp.asarray(bc), jnp.asarray(lc), T, L
            )
            flags = None
        pending.append((total, bsums, flags))

    # ONE readback for everything: the tunnel charges ~29 ms fixed latency
    # per host transfer and jpoints_to_host alone is three of them, so the
    # total + every chunk's bucket sums (and the doubling flags, when the
    # fast no-doubling scan ran) ride home in a single (72, 1+K[+1]) array
    # (bytes are trivial; the latency was the cost)
    xs = [pending[0][0].x] + [b.x for _, b, _ in pending]
    ys = [pending[0][0].y] + [b.y for _, b, _ in pending]
    zs = [pending[0][0].z] + [b.z for _, b, _ in pending]
    flagged = pending[0][2] is not None
    if flagged:
        arr = np.asarray(
            _pack_stream_results_flagged(
                tuple(xs), tuple(ys), tuple(zs),
                tuple(f for _, _, f in pending),
            )
        )
        flags_host = arr[: 72, -1]
        arr = arr[:, :-1]
        if flags_host.any():
            # a p == q doubling collision hit the fast-path scan (requires
            # a running prefix to equal the incoming base — essentially
            # only constructible on purpose). Redo on the doubling-safe
            # full-prefix pipeline: exactness preserved, cost ~2x once.
            _dbg("doubling flag set -> safe-path redo")
            return _msm_stream_impl(
                points_in, scalars_in, c, None, routed, _safe=True
            )
    else:
        arr = np.asarray(
            _pack_stream_results(tuple(xs), tuple(ys), tuple(zs))
        )
    pts = og.jpoints_to_host(JPoints(arr[:24], arr[24:48], arr[48:]))
    total_host, bsums_host = pts[0], pts[1:]
    _dbg("materialized")
    res = _combine_windows_host(total_host, bsums_host[:W], c, W)
    _dbg("combined")
    return res


def ladder_point_ops(n: int) -> int:
    """Group operations executed per lane by the GLV dual-table ladder MSM
    (doublings + window adds + table builds + endomorphism maps), plus the
    tree reduce."""
    from curdleproofs_tpu.ops import pallas_g1

    if pallas_g1.GLV_W == 4:
        return (132 + 66 + 14 + 15) * n + n
    return (129 + 86 + 6 + 7) * n + n


def msm_ladder(points: APoints, scalars: jnp.ndarray) -> G1:
    """Ladder MSM: GLV-split scalars (ops.glv, host numpy), then 43 fused
    triple-double + dual-table-add steps at full batch width + tree reduce.
    Zero sorts/gathers — every step is a fused Pallas point op at maximal VPU
    occupancy, so despite the higher op count this beats the sort-based
    Pippenger on TPU (XLA sort/gather dominate there)."""
    from curdleproofs_tpu.ops import pallas_g1
    from curdleproofs_tpu.utils.profiling import timed

    n = points.x.shape[-1]
    with timed("msm.ladder", items=n, point_ops=ladder_point_ops(n)):
        if pallas_g1.enabled():
            from curdleproofs_tpu.ops import glv

            # scalars may still be host numpy (protocol path) — asarray is
            # then free; for device arrays it is the one required transfer
            s1, neg1, s2 = glv.decompose(np.asarray(scalars).astype(np.uint64))
            res = _glv_ladder_reduce(
                points.x,
                points.y,
                points.inf,
                jnp.asarray(neg1),
                jnp.asarray(s1),
                jnp.asarray(s2),
            )
        else:
            res = _msm_ladder_device(points, scalars)
        return og.jpoints_to_host_packed(res)[0]


@jax.jit
def _glv_ladder_reduce(px, py, pinf, neg1, s1, s2) -> "og.JPoints":
    from curdleproofs_tpu.ops import pallas_g1

    acc = pallas_g1.scalar_mul_glv(APoints(px, py, pinf), s1, neg1, s2)
    return oscan.tree_reduce_hybrid(acc)


# backwards-compatible alias (oracle/cross-check path in tests)
def msm_naive(points: APoints, scalars: jnp.ndarray) -> G1:
    return msm_ladder(points, scalars)


def msm_ladder_segmented(
    points: APoints, scalars_np: np.ndarray, K: int
) -> List[G1]:
    """K independent same-width MSMs as ONE device dispatch.

    points (24, K*m) affine, scalars (16, K*m) host numpy canonical limbs;
    segment k owns lanes [k*m, (k+1)*m). Returns the K segment results.
    This is the device engine behind lockstep batch *proving* (SURVEY §2.3
    batch parallelism): 64 concurrent ell=124 provers make every protocol
    MSM a 64x128-lane batch — ladder-kernel territory — where the reference
    (msm_accumulator.py:6-12) loops point-by-point per proof."""
    from curdleproofs_tpu.ops import pallas_g1
    from curdleproofs_tpu.utils.profiling import timed

    n = points.x.shape[-1]
    if n % K:
        raise ValueError("segmented msm: width not divisible by K")
    with timed("msm.ladder_seg", items=n, point_ops=ladder_point_ops(n)):
        if pallas_g1.enabled():
            from curdleproofs_tpu.ops import glv

            s1, neg1, s2 = glv.decompose(scalars_np.astype(np.uint64))
            res = _glv_ladder_segmented(
                points.x,
                points.y,
                points.inf,
                jnp.asarray(neg1),
                jnp.asarray(s1),
                jnp.asarray(s2),
                K,
            )
        else:
            res = _ladder_segmented_xla(points, jnp.asarray(scalars_np), K)
        return og.jpoints_to_host_packed(res)


@partial(jax.jit, static_argnames=("K",))
def _glv_ladder_segmented(px, py, pinf, neg1, s1, s2, K: int) -> "og.JPoints":
    from curdleproofs_tpu.ops import pallas_g1

    acc = pallas_g1.scalar_mul_glv(APoints(px, py, pinf), s1, neg1, s2)
    m = acc.x.shape[-1] // K
    seg = JPoints(
        acc.x.reshape(24, K, m), acc.y.reshape(24, K, m), acc.z.reshape(24, K, m)
    )
    return oscan.tree_reduce_hybrid(seg)


@partial(jax.jit, static_argnames=("K",))
def _ladder_segmented_xla(points: APoints, scalars: jnp.ndarray, K: int):
    acc = og.scalar_mul(points, scalars)
    m = acc.x.shape[-1] // K
    seg = JPoints(
        acc.x.reshape(24, K, m), acc.y.reshape(24, K, m), acc.z.reshape(24, K, m)
    )
    return oscan.tree_reduce_hybrid(seg)


@jax.jit
def _msm_ladder_device(points: APoints, scalars: jnp.ndarray) -> og.JPoints:
    acc = og.scalar_mul(points, scalars)
    return oscan.tree_reduce_hybrid(acc)


# On CPU (XLA looped limb path) the sort-based Pippenger's ~25x lower op
# count wins below this size; on TPU the fused GLV ladder is one device
# dispatch and wins at every size (the Pippenger path's eager digit
# extraction alone costs ~100 dispatches — fatal at protocol sizes).
LADDER_THRESHOLD = 2048

# auto-dispatch: streaming Pippenger takes over from the fused ladder here
# (ladder executes ~229 ops/lane vs the stream's ~25/lane; measured on
# hardware with random-dlog inputs: stream 0.18 s vs ladder 0.24 s at
# 2^14, 0.37 s vs 0.83 s at 2^16 — benchmarks/report.json config2).
STREAM_MIN = int(os.environ.get("CURDLEPROOFS_STREAM_MIN", str(1 << 14)))


# Below this size exact host arithmetic beats a device dispatch round-trip
# (e.g. the verifier's log(n)-sized L/R gamma combinations).
HOST_THRESHOLD = 16


def msm(
    bases: Sequence[G1],
    scalars: Sequence[Fr],
    c: Optional[int] = None,
    method: str = "auto",
) -> G1:
    """Host-facing MSM over host points/scalars (compute_MSM equivalent)."""
    if len(bases) != len(scalars):
        raise ValueError("msm length mismatch")
    if not bases:
        return G1.identity()
    if method == "auto" and len(bases) <= HOST_THRESHOLD:
        from curdleproofs_tpu.curve import msm_host
        from curdleproofs_tpu.utils.profiling import timed

        n = len(bases)
        # host double-and-add: ~1.5 * 255 point ops per element
        with timed("msm.host", items=n, point_ops=383 * n):
            return msm_host(list(bases), list(scalars))
    from curdleproofs_tpu.ops import pallas_g1
    from curdleproofs_tpu.ops.fieldspec import ints_to_limbs

    if method == "auto":
        if pallas_g1.enabled():
            # fused ladder for mid sizes (one dispatch, no host prep);
            # streaming Pippenger once its ~5x-lower op count amortizes
            # the sort/route/transfer pipeline (verdict r3 #4: the merged
            # batch-verification MSM belongs on the stream engine)
            method = "stream" if len(bases) >= STREAM_MIN else "ladder"
        else:
            # no fused kernels (CPU backend): the native C Pippenger beats
            # the XLA looped-limb paths at EVERY size — routing large MSMs
            # into the XLA ladder here used to cost minutes per call
            from curdleproofs_tpu.curve import msm_host
            from curdleproofs_tpu.utils.profiling import timed

            n = len(bases)
            with timed("msm.host", items=n, point_ops=383 * n):
                return msm_host(list(bases), list(scalars))
    if method == "ladder" and pallas_g1.enabled():
        # pad on HOST to a multiple of the kernel tile so the whole protocol
        # hits a handful of compiled shapes, then one device dispatch; the
        # scalar limb array stays host-side for the GLV split
        n = len(bases)
        m = -(-max(n, 128) // 128) * 128
        bp = list(bases) + [G1.identity()] * (m - n)
        sp = [s.v for s in scalars] + [0] * (m - n)
        pts = og.pack_points(bp)
        scs_np = np.asarray(ints_to_limbs(sp, 16), dtype=np.uint32)
        return msm_ladder(pts, scs_np)
    pts = og.pack_points(list(bases))
    if method in ("stream", "hostsort"):
        from curdleproofs_tpu.ops.fieldspec import ints_to_limbs

        scs_np = np.asarray(
            ints_to_limbs([s.v for s in scalars], 16), dtype=np.uint32
        )
        fn = msm_pippenger_stream if method == "stream" else msm_pippenger_hostsort
        return fn(pts, scs_np, c=c)
    scs = og.pack_scalars(list(scalars))
    if method == "ladder":
        pts, scs = _pad_pow2_inputs(pts, scs)
        return msm_ladder(pts, scs)
    return msm_pippenger(pts, scs, c=c)
