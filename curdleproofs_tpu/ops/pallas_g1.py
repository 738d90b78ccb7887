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
    """Constant limb vectors ride along as a (24, 2) kernel input — col 0 the
    Fq modulus, col 1 Montgomery one (Pallas forbids captured const arrays)."""
    if _VMEM is None:
        return pl.BlockSpec((24, 2), lambda i: (0, 0))
    return pl.BlockSpec((24, 2), lambda i: (0, 0), memory_space=_VMEM)


def _row_spec(blk):
    """(1, blk) uint32 row input (infinity masks)."""
    if _VMEM is None:
        return pl.BlockSpec((1, blk), lambda i: (0, i))
    return pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=_VMEM)


import numpy as np

_CONSTS_NP = np.stack([FQ_SPEC.mod_limbs, FQ_SPEC.one_mont], axis=1).astype(
    np.uint32
)


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
