"""One-hot MXU gather: permutation gathers at matmul speed.

XLA's native lane gather (`take_along_axis`) on TPU lowers to a serial
per-element loop — catastrophically slow for the Pippenger MSM's
sort-into-bucket-order step (ROADMAP: ~1.1 s/MSM at n=2^16, ~200x the add
work). TPUs *do* have one unit that moves data at speed as a side effect of
arithmetic: the MXU. A gather by indices is a matmul against a one-hot
selection matrix:

    out[r, j] = sum_i  table[r, i] * [i == idx[j]]

This kernel streams the table through VMEM in (BN)-column tiles, builds the
one-hot tile ON THE FLY from an iota/compare (it never touches HBM), splits
the u32 payload into four exact bf16 byte planes, and accumulates the
(4R, BM) f32 partials in a VMEM scratch across the contraction grid axis.
Every term of the dot product is either 0 or an integer < 256, and exactly
one term per output element is nonzero, so bf16xbf16->f32 MXU arithmetic is
EXACT — this is a bit-exact gather, not an approximation.

Cost for (R rows, n table cols, m gathered cols): R*4*n*m bf16 MACs.
At the MSM's operating point (R=49, n=m=65536 per window) that is ~4 ms of
MXU time per window vs ~50+ ms for the XLA gather.

Used by ops.msm for the host-sorted Pippenger path (gathering point records
into digit-sorted order, and bucket-boundary prefix extraction).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # TPU memory spaces; absent on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vspec(shape, index_map):
    if _VMEM is None:
        return pl.BlockSpec(shape, index_map)
    return pl.BlockSpec(shape, index_map, memory_space=_VMEM)


def _byte_planes_bf16(t, planes: int):
    """(R, K) u32 -> (planes*R, K) exact bf16 byte planes.

    planes=4 covers full u32; planes=2 is exact whenever every table value
    is < 2^16 — true for ALL the MSM's tables (field elements ride as
    16-bit limbs in u32 containers, ops/fieldspec.py) — and HALVES the MXU
    MAC count of every one-hot gather. Mosaic has no direct u32/bool ->
    bf16 cast; route via i32 -> f32 (all values < 256, every hop exact)."""
    ps = [(t >> jnp.uint32(8 * i)) & jnp.uint32(0xFF) for i in range(planes)]
    return (
        jnp.concatenate(ps, axis=0)
        .astype(jnp.int32)
        .astype(jnp.float32)
        .astype(jnp.bfloat16)
    )


def _recombine_planes(acc, R: int, BM: int, planes: int):
    """(planes*R, BM) f32 exact byte sums -> (R, BM) u32."""
    p = acc.astype(jnp.int32).astype(jnp.uint32).reshape(planes, R, BM)
    out = p[0]
    for i in range(1, planes):
        out = out | (p[i] << jnp.uint32(8 * i))
    return out


@functools.lru_cache(maxsize=None)
def _build(R: int, W: int, N: int, M: int, BN: int, BM: int, P: int = 4):
    """pallas_call for batched one-hot gather.

    table (R, W, N) u32, idx (W, M) int32 -> out (R, W, M) u32.
    Grid (W, M/BM, N/BN), contraction axis minor so the f32 accumulator
    scratch persists across it. P = byte planes (see _byte_planes_bf16).
    """
    K = N // BN

    def kernel(tab_ref, idx_ref, out_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        t = tab_ref[...].reshape(R, BN)
        a = _byte_planes_bf16(t, P)  # (P*R, BN)
        cols = lax.broadcasted_iota(jnp.int32, (BN, BM), 0) + k * BN
        idx = idx_ref[...].reshape(1, BM)
        # NOTE: a one-hot via f32 select + single bf16 cast measured only
        # ~3% faster than this chain (the rowwise dots are MXU-pipeline
        # bound, not cast bound) and invalidates every cached kernel, so
        # the original form stays.
        oh = (
            (cols == idx).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        )  # (BN, BM)
        acc_ref[...] += jnp.dot(a, oh, preferred_element_type=jnp.float32)

        @pl.when(k == K - 1)
        def _finish():
            out_ref[...] = _recombine_planes(acc_ref[...], R, BM, P).reshape(
                R, 1, BM
            )

    grid = (W, M // BM, K)

    def call(table, idx):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _vspec((R, 1, BN), lambda w, j, k: (0, w, k)),
                _vspec((1, BM), lambda w, j, k: (w, j)),
            ],
            out_specs=_vspec((R, 1, BM), lambda w, j, k: (0, w, j)),
            out_shape=jax.ShapeDtypeStruct((R, W, M), jnp.uint32),
            scratch_shapes=(
                [pltpu.VMEM((P * R, BM), jnp.float32)] if pltpu is not None else []
            ),
            interpret=_interpret(),
        )(table, idx)

    return call


@functools.lru_cache(maxsize=None)
def _build_wlead(R: int, W: int, N: int, M: int, BN: int, BM: int, P: int = 4):
    """Batched one-hot gather with the window axis LEADING — the layout
    Mosaic's block constraints require when W > 1 (the last two block dims
    must be divisible by (8, 128) or equal to the array dims; a (R, 1, BN)
    block over a (R, W, N) table is rejected on real TPUs, a (1, R, BN)
    block over (W, R, N) is legal since R == R).

    table (W, R, N) u32, idx (W, 1, M) i32 -> out (W, R, M) u32."""
    K = N // BN

    def kernel(tab_ref, idx_ref, out_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        t = tab_ref[...].reshape(R, BN)
        a = _byte_planes_bf16(t, P)
        cols = lax.broadcasted_iota(jnp.int32, (BN, BM), 0) + k * BN
        idx = idx_ref[...].reshape(1, BM)
        oh = jnp.where(
            cols == idx, jnp.float32(1), jnp.float32(0)
        ).astype(jnp.bfloat16)
        acc_ref[...] += jnp.dot(a, oh, preferred_element_type=jnp.float32)

        @pl.when(k == K - 1)
        def _finish():
            out_ref[...] = _recombine_planes(acc_ref[...], R, BM, P).reshape(
                1, R, BM
            )

    grid = (W, M // BM, K)

    def call(table_wlead, idx_wlead):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _vspec((1, R, BN), lambda w, j, k: (w, 0, k)),
                _vspec((1, 1, BM), lambda w, j, k: (w, 0, j)),
            ],
            out_specs=_vspec((1, R, BM), lambda w, j, k: (w, 0, j)),
            out_shape=jax.ShapeDtypeStruct((W, R, M), jnp.uint32),
            scratch_shapes=(
                [pltpu.VMEM((P * R, BM), jnp.float32)] if pltpu is not None else []
            ),
            interpret=_interpret(),
        )(table_wlead, idx_wlead)

    return call


def gather_u32(
    table: jnp.ndarray, idx: jnp.ndarray, planes: int = 4
) -> jnp.ndarray:
    """Batched exact u32 gather along the last axis via one-hot MXU matmuls.

    table: (R, W, N) uint32; idx: (W, M) int32 with values in [0, N) (or any
    out-of-range value to gather 0). Returns (R, W, M) uint32:
    out[r, w, j] = table[r, w, idx[w, j]].

    planes=2 halves the MXU work and is exact iff every table value is
    < 2^16 (the MSM's 16-bit-limb tables; see _byte_planes_bf16).

    Both tiled axes are padded to Mosaic-legal block multiples (table columns
    with zeros, indices with -1, which gathers 0).
    """
    R, W, N = table.shape
    W2, M = idx.shape
    assert W2 == W
    BN, BM = 512, 256
    Np = -(-N // BN) * BN
    Mp = -(-M // BM) * BM
    if Np != N:
        table = jnp.pad(table, ((0, 0), (0, 0), (0, Np - N)))
    if Mp != M:
        idx = jnp.pad(idx, ((0, 0), (0, Mp - M)), constant_values=-1)
    if W == 1:
        # (R, 1, BN) blocks are legal when the W dim is 1 (block == array dim)
        out = _build(R, W, Np, Mp, BN, BM, planes)(table, idx.astype(jnp.int32))
        return out[:, :, :M]
    # W > 1: window-leading layout (one cheap transpose each way)
    out = _build_wlead(R, W, Np, Mp, BN, BM, planes)(
        jnp.transpose(table, (1, 0, 2)), idx.astype(jnp.int32)[:, None, :]
    )
    return jnp.transpose(out, (1, 0, 2))[:, :, :M]


def gather_u32_shared(
    table: jnp.ndarray, idx: jnp.ndarray, planes: int = 4
) -> jnp.ndarray:
    """Gather with one shared table: table (R, N), idx (W, M) -> (R, W, M).

    Flattens the W windows into the M axis of a single unbatched kernel call
    (the table is identical for every window, so this keeps the one-hot
    contraction at N x (W*M) instead of re-streaming per window)."""
    R, N = table.shape
    W, M = idx.shape
    flat = gather_u32(table[:, None, :], idx.reshape(1, W * M), planes)
    return flat.reshape(R, W, M)


def gather_u32_xla(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA implementation (take_along_axis) for tests/fallback."""
    R, W, N = table.shape
    safe = jnp.clip(idx, 0, N - 1)
    hit = (idx >= 0) & (idx < N)
    g = jnp.take_along_axis(table, safe[None, :, :], axis=-1)
    return jnp.where(hit[None, :, :], g, jnp.zeros_like(g))


# ---------------------------------------------------------------------------
# Routed gather: 3-stage Beneš/Hall factorization of a permutation gather.
#
# The direct one-hot gather above costs 4R*n*n MACs per permutation —
# quadratic in n, and the dominant cost of the host-sorted Pippenger at
# n >= 2^16. ops.route factors each window's permutation into within-rows ∘
# within-columns ∘ within-rows local gathers over an (r x c) view of the
# positions, cutting the MAC count to 4R*n*(2c + r) (~85x at 2^16, ~340x at
# 2^20). The device half below is one generic kernel: a row-local batched
# one-hot gather where every group has its own small table.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _build_rowwise(R: int, G: int, K: int, M: int, GB: int, BM: int, P: int = 4):
    """Row-local batched one-hot gather.

    table (G, R, K) u32, idx (G, 1, M) i32 -> out (G, R, M) u32 with
    out[g, :, m] = table[g, :, idx[g, 0, m]] (out-of-range -> 0).

    The contraction width K fits one block (K <= 512 always: it is r or c of
    the routing), so there is no accumulator scratch; each grid step handles
    GB groups with an unrolled loop of (P*R, K) @ (K, BM) exact-bf16 dots.
    """

    def kernel(tab_ref, idx_ref, out_ref):
        for g in range(GB):
            t = tab_ref[g]  # (R, K)
            a = _byte_planes_bf16(t, P)  # (P*R, K)
            rows = lax.broadcasted_iota(jnp.int32, (K, BM), 0)
            oh = (
                (rows == idx_ref[g].reshape(1, BM))
                .astype(jnp.int32)
                .astype(jnp.float32)
                .astype(jnp.bfloat16)
            )  # (K, BM)
            acc = jnp.dot(a, oh, preferred_element_type=jnp.float32)
            out_ref[g] = _recombine_planes(acc, R, BM, P)

    grid = (G // GB, M // BM)

    def call(table, idx):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _vspec((GB, R, K), lambda g, j: (g, 0, 0)),
                _vspec((GB, 1, BM), lambda g, j: (g, 0, j)),
            ],
            out_specs=_vspec((GB, R, BM), lambda g, j: (g, 0, j)),
            out_shape=jax.ShapeDtypeStruct((G, R, M), jnp.uint32),
            interpret=_interpret(),
        )(table, idx)

    return call


def rowwise_gather(
    table: jnp.ndarray, idx: jnp.ndarray, planes: int = 4
) -> jnp.ndarray:
    """Batched row-local gather: table (G, R, K) u32, idx (G, M) i32 ->
    (G, R, M) u32, out[g, :, m] = table[g, :, idx[g, m]] (out-of-range -> 0).
    planes=2 is exact iff all table values < 2^16 (_byte_planes_bf16).
    """
    G, R, K = table.shape
    G2, M = idx.shape
    assert G2 == G
    # Group batch sized by a ~6 MB VMEM budget for (tables + outputs) per
    # step: the small-K stages of the routed gather otherwise run hundreds
    # of grid steps whose fixed DMA/step overhead dominates (measured 6.2
    # T-MAC/s at GB = 2048//K vs 34 for the direct gather).
    BM = M if M <= 2048 else 2048
    while M % BM:
        BM -= 128 if BM > 128 else 1
    GB = max(1, min(G, (6 << 20) // (R * (K + BM) * 4)))
    if _interpret():
        # interpret mode inlines the kernel's unrolled GB-group loop into
        # one XLA computation; hundreds of groups per step produce graphs
        # the XLA:CPU compiler chews on for minutes (and occasionally
        # crashes on). Small-K test shapes hit GB in the hundreds — cap it.
        GB = min(GB, 8)
    while G % GB:
        GB -= 1
    return _build_rowwise(R, G, K, M, GB, BM, planes)(table, idx[:, None, :])


def routed_gather(
    packed: jnp.ndarray,
    i1: jnp.ndarray,
    i2: jnp.ndarray,
    i3: jnp.ndarray,
    planes: int = 4,
) -> jnp.ndarray:
    """Permutation gather of a shared table via 3-stage routing tables.

    packed (R, n) u32; i1 (W, r, c), i2 (W, c, r), i3 (W, r, c) int32 from
    ops.route.decompose. Returns (R, W, n) u32 with
    out[:, w, a2*c + b] = packed[:, src_w[a2*c + b]] for the permutation
    src_w the tables encode. MAC cost planes*R*n*(2c + r) vs the direct
    gather's planes*R*n*n. planes=2 is exact iff all values < 2^16.
    """
    R, n = packed.shape
    W, r, c = i1.shape
    assert r * c == n and i2.shape == (W, c, r) and i3.shape == (W, r, c)
    # stage 1: r groups SHARED by all windows -> gather all W*c targets of
    # each source row at once (bigger M per group, no table broadcast)
    tab1 = packed.reshape(R, r, c).transpose(1, 0, 2)  # (r, R, c)
    idx1 = i1.transpose(1, 0, 2).reshape(r, W * c)
    s1 = rowwise_gather(tab1, idx1, planes)  # (r, R, W*c): s1[a, :, (w,j)]
    # stage 2 table: X2[(w,j), :, a] = s1[a, :, (w,j)]
    tab2 = s1.reshape(r, R, W, c).transpose(2, 3, 1, 0).reshape(W * c, R, r)
    s2 = rowwise_gather(tab2, i2.reshape(W * c, r), planes)  # (W*c, R, r)
    # stage 3 table: X3[(w,a2), :, j] = s2[(w,j), :, a2]
    tab3 = s2.reshape(W, c, R, r).transpose(0, 3, 2, 1).reshape(W * r, R, c)
    s3 = rowwise_gather(tab3, i3.reshape(W * r, c), planes)  # (W*r, R, c)
    return s3.reshape(W, r, R, c).transpose(2, 0, 1, 3).reshape(R, W, n)
