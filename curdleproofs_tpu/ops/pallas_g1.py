"""Fused Pallas TPU kernels for batched G1 point operations.

The XLA limb path (ops.modarith looped/unrolled) streams every intermediate
field element through HBM; a complete Jacobian add is ~30 Montgomery muls, so
the op is memory-bound long before the VPU saturates. These kernels fuse the
ENTIRE point operation into one Pallas program per (24, BLK) lane tile:
inputs are DMA'd to VMEM once, all ~10^2 limb-vector intermediates live in
VMEM/registers, and only the 3 result coordinates go back to HBM — pushing
the op to the VPU compute roof (pallas_guide.md: HBM->VMEM->compute).

The kernel bodies reuse the exact jnp formula code from ops.g1/ops.modarith
(forced into unrolled mode), so correctness is inherited from the tested XLA
path; tests additionally run these kernels in interpreter mode on CPU.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU memory spaces; absent on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from curdleproofs_tpu.ops import modarith as ma
from curdleproofs_tpu.ops.fieldspec import FQ_SPEC

BLK = 512  # lanes per tile: 24x512 u32 = 48 KB per coordinate buffer
MIN_LANES = 128  # below this the XLA path wins (kernel launch overhead)


def _pick_blk(n: int) -> int:
    """Tile width: full-throughput 512-lane tiles for big vectors, one
    128-lane tile for small (protocol-sized) vectors to keep latency low."""
    return 512 if n >= 2048 else 128

_FORCE = os.environ.get("CURDLEPROOFS_PALLAS", "auto")


def enabled() -> bool:
    if _FORCE == "1":
        return True
    if _FORCE == "0":
        return False
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _spec(blk):
    if _VMEM is None:
        return pl.BlockSpec((24, blk), lambda i: (0, i))
    return pl.BlockSpec((24, blk), lambda i: (0, i), memory_space=_VMEM)


def _flatten(arrs, blk):
    """(24, *B) -> (24, N) padded to a blk multiple; returns (flats, shape, n)."""
    shape = arrs[0].shape
    n = 1
    for d in shape[1:]:
        n *= d
    m = -(-max(n, 1) // blk) * blk
    out = []
    for a in arrs:
        f = a.reshape(24, n)
        if m != n:
            f = jnp.pad(f, ((0, 0), (0, m - n)))
        out.append(f)
    return out, shape, n


def _total_lanes(x) -> int:
    n = 1
    for d in x.shape[1:]:
        n *= d
    return n


def _unflatten(arrs, shape, n):
    return [a[:, :n].reshape(shape) for a in arrs]


def _const_spec():
    """Constant limb vectors ride along as a (24, 3) kernel input — col 0 the
    Fq modulus, col 1 Montgomery one, col 2 the GLV endomorphism beta in
    Montgomery form (Pallas forbids captured const arrays)."""
    if _VMEM is None:
        return pl.BlockSpec((24, 3), lambda i: (0, 0))
    return pl.BlockSpec((24, 3), lambda i: (0, 0), memory_space=_VMEM)


def _row_spec(blk):
    """(1, blk) uint32 row input (infinity masks)."""
    if _VMEM is None:
        return pl.BlockSpec((1, blk), lambda i: (0, i))
    return pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=_VMEM)


import numpy as np

from curdleproofs_tpu.ops.glv import BETA as _GLV_BETA


def _beta_mont_limbs() -> np.ndarray:
    v = _GLV_BETA * FQ_SPEC.r_mod % FQ_SPEC.modulus
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(24)], dtype=np.uint32)


_CONSTS_NP = np.stack(
    [FQ_SPEC.mod_limbs, FQ_SPEC.one_mont, _beta_mont_limbs()], axis=1
).astype(np.uint32)


def _consts_arr():
    # fresh conversion per call: caching a jnp array here would leak tracers
    # when the first call happens inside a traced scope
    return jnp.asarray(_CONSTS_NP)


@functools.lru_cache(maxsize=None)
def _build_kernel(n_in: int, n_rows: int, body_name: str, blk: int = BLK):
    """pallas_call for an elementwise point op: n_in (24, BLK) coordinate
    inputs + n_rows (1, BLK) uint32 mask rows, 3 coordinate outputs."""
    from curdleproofs_tpu.ops import g1 as og

    bodies = {
        "jadd": lambda v, r: og._jadd_formulas(
            og.JPoints(v[0], v[1], v[2]), og.JPoints(v[3], v[4], v[5])
        ),
        "jdbl": lambda v, r: og._jdbl_formulas(og.JPoints(v[0], v[1], v[2])),
        "jmadd": lambda v, r: og._jmadd_formulas(
            og.JPoints(v[0], v[1], v[2]),
            og.APoints(v[3], v[4], r[0][0] != 0),
        ),
    }
    body = bodies[body_name]

    def kernel(const_ref, *refs):
        ins = [r[:] for r in refs[:n_in]]
        rows = [r[:] for r in refs[n_in : n_in + n_rows]]
        with ma.force_unroll(), ma.const_override(
            fq_mod=const_ref[:, 0], fq_one_mont=const_ref[:, 1]
        ):
            res = body(ins, rows)
        base = n_in + n_rows
        refs[base][:] = res.x
        refs[base + 1][:] = res.y
        refs[base + 2][:] = res.z

    def call(*flat_ins):
        m = flat_ins[0].shape[-1]
        grid = (m // blk,)
        out_shape = [jax.ShapeDtypeStruct((24, m), jnp.uint32)] * 3
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[_const_spec()] + [_spec(blk)] * n_in + [_row_spec(blk)] * n_rows,
            out_specs=[_spec(blk)] * 3,
            out_shape=out_shape,
            interpret=_interpret(),
        )(_consts_arr(), *flat_ins)

    return call


def jadd(p, q):
    """Fused complete Jacobian + Jacobian add on (24, *B) coords."""
    from curdleproofs_tpu.ops.g1 import JPoints

    blk = _pick_blk(_total_lanes(p.x))
    flats, shape, n = _flatten([p.x, p.y, p.z, q.x, q.y, q.z], blk)
    outs = _build_kernel(6, 0, "jadd", blk)(*flats)
    x, y, z = _unflatten(outs, shape, n)
    return JPoints(x, y, z)


def jdbl(p):
    """Fused Jacobian doubling on (24, *B) coords."""
    from curdleproofs_tpu.ops.g1 import JPoints

    blk = _pick_blk(_total_lanes(p.x))
    flats, shape, n = _flatten([p.x, p.y, p.z], blk)
    outs = _build_kernel(3, 0, "jdbl", blk)(*flats)
    x, y, z = _unflatten(outs, shape, n)
    return JPoints(x, y, z)


@functools.lru_cache(maxsize=None)
def _build_ladder_kernel(blk: int):
    """The ENTIRE 255-step double-and-add scalar multiplication as one Pallas
    program per tile: points, scalars and the accumulator stay in VMEM for
    all iterations — total HBM traffic is one read of the inputs and one
    write of the result, ~250x less than per-step XLA dispatch."""
    from jax import lax as jlax

    from curdleproofs_tpu.ops import g1 as og

    def kernel(const_ref, px, py, pinf, sc, ox, oy, oz):
        with ma.force_unroll(), ma.const_override(
            fq_mod=const_ref[:, 0], fq_one_mont=const_ref[:, 1]
        ):
            pts = og.APoints(px[:], py[:], pinf[:][0] != 0)
            s = sc[:]
            zero = jnp.zeros_like(px[:])
            acc0 = (zero, zero, zero)  # z == 0: infinity

            def body(i, acc3):
                acc = og.JPoints(*acc3)
                t = 254 - i
                acc = og._jdbl_formulas(acc)
                cand = og._jmadd_formulas(acc, pts)
                # current 16-bit limb without dynamic_slice (not lowerable in
                # Mosaic): 16-way masked select over the static limb rows
                li = t // 16
                limb = jnp.zeros_like(s[0])
                for idx in range(16):
                    limb = jnp.where(li == idx, s[idx], limb)
                bit = (limb >> (t % 16).astype(jnp.uint32)) & jnp.uint32(1)
                acc = og.jselect(bit == 1, cand, acc)
                return (acc.x, acc.y, acc.z)

            x, y, z = jlax.fori_loop(0, 255, body, acc0)
        ox[:] = x
        oy[:] = y
        oz[:] = z

    def sc_spec():
        if _VMEM is None:
            return pl.BlockSpec((16, blk), lambda i: (0, i))
        return pl.BlockSpec((16, blk), lambda i: (0, i), memory_space=_VMEM)

    def call(px, py, pinf_row, sc):
        m = px.shape[-1]
        grid = (m // blk,)
        out_shape = [jax.ShapeDtypeStruct((24, m), jnp.uint32)] * 3
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[_const_spec(), _spec(blk), _spec(blk), _row_spec(blk), sc_spec()],
            out_specs=[_spec(blk)] * 3,
            out_shape=out_shape,
            interpret=_interpret(),
        )(_consts_arr(), px, py, pinf_row, sc)

    return call


@functools.lru_cache(maxsize=None)
def _build_ladder_w3_kernel(blk: int):
    """Windowed (w=3) fused ladder: 85 iterations of 3 doublings + one
    conditional table add, with the odd-multiple table T1..T7 = {1..7}P
    precomputed outside the kernel and streamed in per tile. ~1.55x fewer
    group ops than the bitwise ladder (255 dbl + 85 adds vs 255 + 255)."""
    from jax import lax as jlax

    from curdleproofs_tpu.ops import g1 as og

    def kernel(const_ref, *refs):
        t_refs = refs[:21]  # T1..T7 x/y/z
        sc = refs[21]
        ox, oy, oz = refs[22], refs[23], refs[24]
        with ma.force_unroll(), ma.const_override(
            fq_mod=const_ref[:, 0], fq_one_mont=const_ref[:, 1]
        ):
            T = [
                og.JPoints(t_refs[3 * k][:], t_refs[3 * k + 1][:], t_refs[3 * k + 2][:])
                for k in range(7)
            ]
            s = sc[:]
            zero = jnp.zeros_like(T[0].x)
            acc0 = (zero, zero, zero)  # z == 0: infinity

            def body(i, acc3):
                acc = og.JPoints(*acc3)
                acc = og._jdbl_formulas(acc)
                acc = og._jdbl_formulas(acc)
                acc = og._jdbl_formulas(acc)
                bitpos = 252 - 3 * i
                li = bitpos // 16
                off = (bitpos % 16).astype(jnp.uint32)
                limb_lo = jnp.zeros_like(s[0])
                limb_hi = jnp.zeros_like(s[0])
                for idx in range(16):
                    limb_lo = jnp.where(li == idx, s[idx], limb_lo)
                    limb_hi = jnp.where(li + 1 == idx, s[idx], limb_hi)
                combined = limb_lo | (limb_hi << jnp.uint32(16))
                d = (combined >> off) & jnp.uint32(7)
                tx, ty, tz = T[0].x, T[0].y, T[0].z
                for k in range(2, 8):
                    sel = d == k
                    tx = jnp.where(sel, T[k - 1].x, tx)
                    ty = jnp.where(sel, T[k - 1].y, ty)
                    tz = jnp.where(sel, T[k - 1].z, tz)
                # doubling branch provably unreachable here (see
                # _jadd_formulas docstring) — saves a fused doubling per step
                cand = og._jadd_formulas(
                    acc, og.JPoints(tx, ty, tz), handle_doubling=False
                )
                acc = og.jselect(d == 0, acc, cand)
                return (acc.x, acc.y, acc.z)

            x, y, z = jlax.fori_loop(0, 85, body, acc0)
        ox[:] = x
        oy[:] = y
        oz[:] = z

    def sc_spec():
        if _VMEM is None:
            return pl.BlockSpec((16, blk), lambda i: (0, i))
        return pl.BlockSpec((16, blk), lambda i: (0, i), memory_space=_VMEM)

    def call(t_flats, sc):
        m = t_flats[0].shape[-1]
        grid = (m // blk,)
        out_shape = [jax.ShapeDtypeStruct((24, m), jnp.uint32)] * 3
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[_const_spec()] + [_spec(blk)] * 21 + [sc_spec()],
            out_specs=[_spec(blk)] * 3,
            out_shape=out_shape,
            interpret=_interpret(),
        )(_consts_arr(), *t_flats, sc)

    return call


@functools.lru_cache(maxsize=None)
def _build_glv_ladder_kernel(blk: int):
    """GLV/Straus dual-table fused ladder: k*P = k1*P + k2*phi(P) with
    |k1| < 2^129 signed, 0 <= k2 <= lambda (ops.glv), phi(X,Y,Z) = (beta*X,Y,Z).

    43 iterations of 3 doublings + two conditional table adds; both odd-
    multiple tables live in VMEM, table 1 built in-kernel (3 dbl + 3 madd),
    table 2 derived by the endomorphism (7 field muls). ~2250 Montgomery
    muls/lane vs ~3100 for the single-table 255-bit ladder.

    The table adds use doubling-free Jacobian addition. Soundness: acc's
    value in the GLV lattice is a + b*lambda with |a| <= 1.51*lambda + 7 and
    0 <= b <= lambda at every step; a collision acc == d*(+-P) or acc ==
    d*lambda*P requires a lattice vector (a', c) with a' + c*lambda = 0 mod
    r = lambda^2+lambda+1 in those ranges with c == 0 mod 8 (first add) or
    c in [-7, lambda] (second add) — enumeration of the short vectors
    ((lambda,-1), (1,lambda+1), (lambda+1,lambda), ...) shows none fits
    (lambda is odd, r - c*lambda > 2*lambda for c < lambda, and the c=1
    family needs a = -lambda which the clamped-positive k1 invariant of
    ops.glv.decompose excludes). Cancellation/infinity stay handled."""
    from jax import lax as jlax

    from curdleproofs_tpu.ops import g1 as og

    def kernel(const_ref, px, py, pinf, negr, s1r, s2r, ox, oy, oz):
        with ma.force_unroll(), ma.const_override(
            fq_mod=const_ref[:, 0], fq_one_mont=const_ref[:, 1]
        ):
            beta = const_ref[:, 2].reshape(24, 1)
            inf = pinf[:][0] != 0
            neg = negr[:][0] != 0
            pxv, pyv = px[:], py[:]
            py1 = ma.select(neg, ma.neg(FQ_SPEC, pyv), pyv)
            base1 = og.APoints(pxv, py1, inf)

            t1 = og.lift(base1)
            t2 = og._jdbl_formulas(t1)
            t3 = og._jmadd_formulas(t2, base1, handle_doubling=False)
            t4 = og._jdbl_formulas(t2)
            t5 = og._jmadd_formulas(t4, base1, handle_doubling=False)
            t6 = og._jdbl_formulas(t3)
            t7 = og._jmadd_formulas(t6, base1, handle_doubling=False)
            T1 = [t1, t2, t3, t4, t5, t6, t7]
            # phi is a homomorphism, so T2[k] = k*phi(P) = phi(k*P) =
            # (beta*X, Y, Z) of the table-1 entry — except table 1 carries
            # sign(k1) while k2 is always non-negative, so negate y back on
            # the lanes where table 1 was negated: phi(k*(-P)) = -k*phi(P).
            def endo(t):
                yy = ma.select(neg, ma.neg(FQ_SPEC, t.y), t.y)
                return og.JPoints(ma.mont_mul(FQ_SPEC, t.x, beta), yy, t.z)

            T2 = [endo(t) for t in T1]

            s1 = s1r[:]
            s2 = s2r[:]
            zero = jnp.zeros_like(pxv)
            acc0 = (zero, zero, zero)

            def digit(s, bitpos):
                li = bitpos // 16
                off = (bitpos % 16).astype(jnp.uint32)
                lo = jnp.zeros_like(s[0])
                hi = jnp.zeros_like(s[0])
                for idx in range(9):
                    lo = jnp.where(li == idx, s[idx], lo)
                    hi = jnp.where(li + 1 == idx, s[idx], hi)
                combined = lo | (hi << jnp.uint32(16))
                return (combined >> off) & jnp.uint32(7)

            def tsel(T, d):
                tx, ty, tz = T[0].x, T[0].y, T[0].z
                for k in range(2, 8):
                    sel = d == k
                    tx = jnp.where(sel, T[k - 1].x, tx)
                    ty = jnp.where(sel, T[k - 1].y, ty)
                    tz = jnp.where(sel, T[k - 1].z, tz)
                return og.JPoints(tx, ty, tz)

            def body(i, acc3):
                acc = og.JPoints(*acc3)
                acc = og._jdbl_formulas(acc)
                acc = og._jdbl_formulas(acc)
                acc = og._jdbl_formulas(acc)
                bitpos = 126 - 3 * i
                d1 = digit(s1, bitpos)
                d2 = digit(s2, bitpos)
                c1p = og._jadd_formulas(acc, tsel(T1, d1), handle_doubling=False)
                acc = og.jselect(d1 == 0, acc, c1p)
                c2p = og._jadd_formulas(acc, tsel(T2, d2), handle_doubling=False)
                acc = og.jselect(d2 == 0, acc, c2p)
                return (acc.x, acc.y, acc.z)

            x, y, z = jlax.fori_loop(0, 43, body, acc0)
        ox[:] = x
        oy[:] = y
        oz[:] = z

    def rows_spec(r):
        if _VMEM is None:
            return pl.BlockSpec((r, blk), lambda i: (0, i))
        return pl.BlockSpec((r, blk), lambda i: (0, i), memory_space=_VMEM)

    def call(px, py, pinf_row, neg_row, s1, s2):
        m = px.shape[-1]
        grid = (m // blk,)
        out_shape = [jax.ShapeDtypeStruct((24, m), jnp.uint32)] * 3
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _const_spec(),
                _spec(blk),
                _spec(blk),
                _row_spec(blk),
                _row_spec(blk),
                rows_spec(9),
                rows_spec(9),
            ],
            out_specs=[_spec(blk)] * 3,
            out_shape=out_shape,
            interpret=_interpret(),
        )(_consts_arr(), px, py, pinf_row, neg_row, s1, s2)

    return call


@functools.lru_cache(maxsize=None)
def _build_glv_ladder_w4_kernel(blk: int):
    """w=4 variant of the GLV dual-table ladder: 33 iterations of 4 doublings
    + two conditional 15-entry table adds (132 dbl + 66 adds vs the w=3
    kernel's 129 + 86). Tables: T1 = {1..15}P via 7 dbl + 7 madd, T2 by the
    endomorphism (15 field muls). Soundness of the doubling-free table adds:
    the w=3 lattice argument (see _build_glv_ladder_kernel) carries over with
    digit bound 15 — acc = a + b*lambda with |a| <= 1.51*lambda + 15 and
    0 <= b <= lambda; the short-vector enumeration is unchanged since the
    bounds grow only by 8 against lambda ~ 2^127."""
    from jax import lax as jlax

    from curdleproofs_tpu.ops import g1 as og

    def kernel(const_ref, px, py, pinf, negr, s1r, s2r, ox, oy, oz):
        with ma.force_unroll(), ma.const_override(
            fq_mod=const_ref[:, 0], fq_one_mont=const_ref[:, 1]
        ):
            beta = const_ref[:, 2].reshape(24, 1)
            inf = pinf[:][0] != 0
            neg = negr[:][0] != 0
            pxv, pyv = px[:], py[:]
            py1 = ma.select(neg, ma.neg(FQ_SPEC, pyv), pyv)
            base1 = og.APoints(pxv, py1, inf)

            # odd/even chain: T[2k] = dbl(T[k]), T[2k+1] = T[2k] + P
            T1 = [None] * 16
            T1[1] = og.lift(base1)
            for k in range(1, 8):
                T1[2 * k] = og._jdbl_formulas(T1[k])
                T1[2 * k + 1] = og._jmadd_formulas(
                    T1[2 * k], base1, handle_doubling=False
                )

            def endo(t):
                yy = ma.select(neg, ma.neg(FQ_SPEC, t.y), t.y)
                return og.JPoints(ma.mont_mul(FQ_SPEC, t.x, beta), yy, t.z)

            T2 = [None] + [endo(t) for t in T1[1:]]

            s1 = s1r[:]
            s2 = s2r[:]
            zero = jnp.zeros_like(pxv)
            acc0 = (zero, zero, zero)

            def digit(s, bitpos):
                li = bitpos // 16
                off = (bitpos % 16).astype(jnp.uint32)
                lo = jnp.zeros_like(s[0])
                hi = jnp.zeros_like(s[0])
                for idx in range(9):
                    lo = jnp.where(li == idx, s[idx], lo)
                    hi = jnp.where(li + 1 == idx, s[idx], hi)
                combined = lo | (hi << jnp.uint32(16))
                return (combined >> off) & jnp.uint32(0xF)

            def tsel(T, d):
                tx, ty, tz = T[1].x, T[1].y, T[1].z
                for k in range(2, 16):
                    sel = d == k
                    tx = jnp.where(sel, T[k].x, tx)
                    ty = jnp.where(sel, T[k].y, ty)
                    tz = jnp.where(sel, T[k].z, tz)
                return og.JPoints(tx, ty, tz)

            def body(i, acc3):
                acc = og.JPoints(*acc3)
                for _ in range(4):
                    acc = og._jdbl_formulas(acc)
                bitpos = 128 - 4 * i
                d1 = digit(s1, bitpos)
                d2 = digit(s2, bitpos)
                c1p = og._jadd_formulas(acc, tsel(T1, d1), handle_doubling=False)
                acc = og.jselect(d1 == 0, acc, c1p)
                c2p = og._jadd_formulas(acc, tsel(T2, d2), handle_doubling=False)
                acc = og.jselect(d2 == 0, acc, c2p)
                return (acc.x, acc.y, acc.z)

            x, y, z = jlax.fori_loop(0, 33, body, acc0)
        ox[:] = x
        oy[:] = y
        oz[:] = z

    def rows_spec(r):
        if _VMEM is None:
            return pl.BlockSpec((r, blk), lambda i: (0, i))
        return pl.BlockSpec((r, blk), lambda i: (0, i), memory_space=_VMEM)

    def call(px, py, pinf_row, neg_row, s1, s2):
        m = px.shape[-1]
        grid = (m // blk,)
        out_shape = [jax.ShapeDtypeStruct((24, m), jnp.uint32)] * 3
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _const_spec(),
                _spec(blk),
                _spec(blk),
                _row_spec(blk),
                _row_spec(blk),
                rows_spec(9),
                rows_spec(9),
            ],
            out_specs=[_spec(blk)] * 3,
            out_shape=out_shape,
            interpret=_interpret(),
        )(_consts_arr(), px, py, pinf_row, neg_row, s1, s2)

    return call


# GLV ladder window width. w=4 (15-entry tables) executes ~13% fewer
# Montgomery muls but needs ~2x the VMEM, forcing 128-lane tiles — measured
# net 3% SLOWER than w=3 at 256-lane tiles on v5e (1.065 s vs 1.034 s per
# n=2^16 MSM), so w=3 stays the default; kept as a tunable for other parts.
GLV_W = int(os.environ.get("CURDLEPROOFS_GLV_W", "3"))


def _pick_blk_glv(n: int) -> int:
    """The dual tables (14 Jacobian points at w=3, 30 at w=4) push the GLV
    kernel's VMEM working set to ~10-12 MB at 256/128 lanes; bigger tiles
    OOM the 16 MB budget."""
    if GLV_W == 4:
        return 128
    return 256 if n >= 2048 else 128


def scalar_mul_glv(points, s1, neg1, s2):
    """Fused per-lane k_i * P_i via the GLV dual-table ladder.

    points: (24, *B) affine; s1, s2: (9, *B) u32 limb arrays of |k1|, k2;
    neg1: (*B,) bool/u32 sign of k1 (from ops.glv.decompose)."""
    from curdleproofs_tpu.ops.g1 import JPoints

    blk = _pick_blk_glv(_total_lanes(points.x))
    flats, shape, n = _flatten([points.x, points.y], blk)
    m = flats[0].shape[-1]

    def pad_rows(a, rows, fill=0):
        f = jnp.asarray(a).reshape(rows, -1).astype(jnp.uint32)
        if f.shape[-1] != m:
            f = jnp.pad(f, ((0, 0), (0, m - f.shape[-1])), constant_values=fill)
        return f

    inf_flat = pad_rows(points.inf.astype(jnp.uint32), 1, fill=1)
    neg_flat = pad_rows(neg1.astype(jnp.uint32), 1)
    s1f = pad_rows(s1, 9)
    s2f = pad_rows(s2, 9)
    build = _build_glv_ladder_w4_kernel if GLV_W == 4 else _build_glv_ladder_kernel
    outs = build(blk)(flats[0], flats[1], inf_flat, neg_flat, s1f, s2f)
    x, y, z = _unflatten(outs, shape, n)
    return JPoints(x, y, z)


def scalar_mul(points, scalars):
    """Fused per-lane k_i * P_i over (24, *B) affine points; returns Jacobian.

    scalars: (16, *B) canonical Fr limbs. Uses the windowed (w=3) fused
    ladder: odd-multiple table built with fused dbl/madd kernels, then one
    Pallas program runs all 85 window iterations in VMEM."""
    from curdleproofs_tpu.ops.g1 import JPoints

    blk = _pick_blk(_total_lanes(points.x))
    # table {1..7}P in Jacobian form (built from fused kernels, stays batched)
    t1 = _lift_outside(points)
    t2 = jdbl(t1)
    t3 = jmadd(t2, points)
    t4 = jdbl(t2)
    t5 = jmadd(t4, points)
    t6 = jdbl(t3)
    t7 = jmadd(t6, points)
    coords = []
    for t in (t1, t2, t3, t4, t5, t6, t7):
        coords.extend([t.x, t.y, t.z])
    t_flats, shape, n = _flatten(coords, blk)
    m = t_flats[0].shape[-1]
    sc_flat = scalars.reshape(16, -1)
    if sc_flat.shape[-1] != m:
        sc_flat = jnp.pad(sc_flat, ((0, 0), (0, m - sc_flat.shape[-1])))
    outs = _build_ladder_w3_kernel(blk)(t_flats, sc_flat)
    x, y, z = _unflatten(outs, shape, n)
    return JPoints(x, y, z)


def _lift_outside(points):
    from curdleproofs_tpu.ops import g1 as og

    return og.lift(points)


def scalar_mul_w1(points, scalars):
    """Bitwise fused ladder (255 dbl + 255 masked adds); kept for
    cross-checking and as a fallback."""
    from curdleproofs_tpu.ops.g1 import JPoints

    blk = _pick_blk(_total_lanes(points.x))
    flats, shape, n = _flatten([points.x, points.y], blk)
    m = flats[0].shape[-1]
    inf_flat = points.inf.astype(jnp.uint32).reshape(1, -1)
    if inf_flat.shape[-1] != m:
        inf_flat = jnp.pad(
            inf_flat, ((0, 0), (0, m - inf_flat.shape[-1])), constant_values=1
        )
    sc_flat = scalars.reshape(16, -1)
    if sc_flat.shape[-1] != m:
        sc_flat = jnp.pad(sc_flat, ((0, 0), (0, m - sc_flat.shape[-1])))
    outs = _build_ladder_kernel(blk)(flats[0], flats[1], inf_flat, sc_flat)
    x, y, z = _unflatten(outs, shape, n)
    return JPoints(x, y, z)


def jmadd(p, q):
    """Fused complete Jacobian + affine mixed add on (24, *B) coords."""
    from curdleproofs_tpu.ops.g1 import JPoints

    blk = _pick_blk(_total_lanes(p.x))
    flats, shape, n = _flatten([p.x, p.y, p.z, q.x, q.y], blk)
    m = flats[0].shape[-1]
    inf_flat = q.inf.astype(jnp.uint32).reshape(1, -1)
    if inf_flat.shape[-1] != m:
        # pad lanes as infinity so the garbage result is q-absent (= p)
        inf_flat = jnp.pad(
            inf_flat, ((0, 0), (0, m - inf_flat.shape[-1])), constant_values=1
        )
    outs = _build_kernel(5, 1, "jmadd", blk)(*flats, inf_flat)
    x, y, z = _unflatten(outs, shape, n)
    return JPoints(x, y, z)
