"""Batched BLS12-381 G1 group kernels (JAX, TPU-first).

Points are structs-of-arrays of Fq limbs (limb-major (24, *B) uint32,
Montgomery form):

  * `JPoints` — Jacobian (X, Y, Z), Z == 0 encodes infinity.
  * `APoints` — affine (x, y) plus an explicit infinity mask.

All group ops are *complete* and branchless: doubling, inverse and infinity
inputs are resolved with masked selects, never data-dependent branches, so
everything jits to static TPU programs. Replaces the reference's per-point
Rust calls (py_arkworks_bls12381-stubs/__init__.pyi:5-30) with vectorized
device kernels; formulas are the standard EFD Jacobian a=0 formulas
(dbl-2009-l, add-2007-bl, madd-2007-bl).

BLS12-381 G1 has prime order (no 2-torsion), so y == 0 never occurs for
finite curve points and the doubling formula needs no special case.
"""
from __future__ import annotations

from functools import partial
from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.ops import modarith as ma
from curdleproofs_tpu.ops.fieldspec import (
    FQ_SPEC,
    FR_SPEC,
    ints_to_limbs,
    limbs_to_ints,
)

_add = partial(ma.add, FQ_SPEC)
_sub = partial(ma.sub, FQ_SPEC)
_mul = partial(ma.mont_mul, FQ_SPEC)
_sqr = partial(ma.mont_sqr, FQ_SPEC)
_neg = partial(ma.neg, FQ_SPEC)
_dbl = partial(ma.double, FQ_SPEC)
_is0 = partial(ma.is_zero, FQ_SPEC)
_feq = partial(ma.eq, FQ_SPEC)
_fsel = ma.select

FQ_LIMBS = FQ_SPEC.nlimbs
FR_LIMBS = FR_SPEC.nlimbs
FR_BITS = 255


class JPoints(NamedTuple):
    x: jnp.ndarray  # (24, *B) Montgomery
    y: jnp.ndarray
    z: jnp.ndarray  # z == 0 <=> infinity


class APoints(NamedTuple):
    x: jnp.ndarray  # (24, *B) Montgomery
    y: jnp.ndarray
    inf: jnp.ndarray  # (*B,) bool


def jselect(mask, p: JPoints, q: JPoints) -> JPoints:
    """Per-lane select: p where mask else q."""
    return JPoints(_fsel(mask, p.x, q.x), _fsel(mask, p.y, q.y), _fsel(mask, p.z, q.z))


def jinf(batch_shape=()) -> JPoints:
    z = jnp.zeros((FQ_LIMBS,) + tuple(batch_shape), dtype=jnp.uint32)
    one = jnp.zeros_like(z).at[0].set(1)
    return JPoints(one, one, z)


def is_inf(p: JPoints):
    return _is0(p.z)


def lift(a: APoints) -> JPoints:
    """Affine -> Jacobian (z = 1 in Montgomery form, masked by inf)."""
    one = ma.get_const("fq_one_mont", FQ_SPEC.one_mont).reshape(
        (FQ_LIMBS,) + (1,) * (a.x.ndim - 1)
    )
    z = jnp.where(a.inf[None], jnp.zeros_like(a.x), jnp.broadcast_to(one, a.x.shape))
    return JPoints(a.x, a.y, z)


def _jdbl_formulas(p: JPoints) -> JPoints:
    """Jacobian doubling, complete (infinity passes through via z=0)."""
    a = _sqr(p.x)
    b = _sqr(p.y)
    c = _sqr(b)
    t = _add(p.x, b)
    d = _dbl(_sub(_sub(_sqr(t), a), c))
    e = _add(_add(a, a), a)
    f = _sqr(e)
    x3 = _sub(f, _dbl(d))
    c8 = _dbl(_dbl(_dbl(c)))
    y3 = _sub(_mul(e, _sub(d, x3)), c8)
    z3 = _dbl(_mul(p.y, p.z))
    return JPoints(x3, y3, z3)


def _jadd_formulas(
    p: JPoints, q: JPoints, handle_doubling: bool = True
) -> JPoints:
    """Complete Jacobian + Jacobian addition.

    handle_doubling=False drops the p == q branch (saves a fused doubling).
    ONLY sound where that case is impossible — e.g. the windowed ladder's
    table adds: acc = 8*prefix*P vs table d*P with d in [1,7] and k < r gives
    8*prefix ≡ d (mod r) no solutions (d/8 non-integral; (r+d)/8 integral only
    for d=7 needing a 252-bit prefix equal to (r+7)/8, i.e. k >= r; (2r+d)/8
    needs 253 bits > max prefix width). Cancellation (p == -q) stays handled
    for free via z3 = 0.
    """
    z1z1 = _sqr(p.z)
    z2z2 = _sqr(q.z)
    u1 = _mul(p.x, z2z2)
    u2 = _mul(q.x, z1z1)
    s1 = _mul(_mul(p.y, q.z), z2z2)
    s2 = _mul(_mul(q.y, p.z), z1z1)
    h = _sub(u2, u1)
    i = _sqr(_dbl(h))
    j = _mul(h, i)
    r = _dbl(_sub(s2, s1))
    v = _mul(u1, i)
    x3 = _sub(_sub(_sqr(r), j), _dbl(v))
    y3 = _sub(_mul(r, _sub(v, x3)), _dbl(_mul(s1, j)))
    zz = _sub(_sub(_sqr(_add(p.z, q.z)), z1z1), z2z2)
    z3 = _mul(zz, h)  # h == 0 -> z3 == 0: P + (-P) lands on infinity for free
    res = JPoints(x3, y3, z3)

    if handle_doubling:
        dbl_case = _is0(h) & _is0(r) & ~is_inf(p) & ~is_inf(q)
        res = jselect(dbl_case, _jdbl_formulas(p), res)
    res = jselect(is_inf(q), p, res)
    res = jselect(is_inf(p), q, res)
    return res


def _lanes(p: JPoints) -> int:
    n = 1
    for d in p.x.shape[1:]:
        n *= d
    return n


def jdbl(p: JPoints) -> JPoints:
    """Jacobian doubling — dispatches to the fused Pallas kernel on TPU."""
    from curdleproofs_tpu.ops import pallas_g1

    if pallas_g1.enabled() and _lanes(p) >= pallas_g1.MIN_LANES:
        return pallas_g1.jdbl(p)
    return _jdbl_formulas(p)


def jadd(p: JPoints, q: JPoints) -> JPoints:
    """Complete Jacobian add — dispatches to the fused Pallas kernel on TPU."""
    from curdleproofs_tpu.ops import pallas_g1

    if pallas_g1.enabled() and _lanes(p) >= pallas_g1.MIN_LANES:
        return pallas_g1.jadd(p, q)
    return _jadd_formulas(p, q)


def _jmadd_formulas(
    p: JPoints, q: APoints, handle_doubling: bool = True
) -> JPoints:
    """Complete Jacobian + affine mixed addition (madd-2007-bl).

    handle_doubling=False is sound only where p == q (as points) is
    impossible — e.g. odd-multiple table construction 2kP + P (equality would
    force (2k-1)P = inf, i.e. P = inf, which the infinity selects handle)."""
    z1z1 = _sqr(p.z)
    u2 = _mul(q.x, z1z1)
    s2 = _mul(_mul(q.y, p.z), z1z1)
    h = _sub(u2, p.x)
    hh = _sqr(h)
    i = _dbl(_dbl(hh))
    j = _mul(h, i)
    r = _dbl(_sub(s2, p.y))
    v = _mul(p.x, i)
    x3 = _sub(_sub(_sqr(r), j), _dbl(v))
    y3 = _sub(_mul(r, _sub(v, x3)), _dbl(_mul(p.y, j)))
    z3 = _mul(_dbl(p.z), h)  # h == 0 -> infinity for free
    res = JPoints(x3, y3, z3)

    if handle_doubling:
        dbl_case = _is0(h) & _is0(r) & ~is_inf(p) & ~q.inf
        res = jselect(dbl_case, _jdbl_formulas(p), res)
    res = jselect(q.inf, p, res)
    res = jselect(is_inf(p), lift(q), res)
    return res


def _jmadd_formulas_flagged(p: JPoints, q: APoints):
    """Mixed add WITHOUT the fused doubling path, plus a per-lane flag.

    The complete madd (handle_doubling=True) spends ~5.5 extra montmul-
    equivalents per step on a full Jacobian doubling that exists only for
    the p == q edge case — astronomically rare in MSM prefix scans (it
    requires a running prefix to exactly equal the incoming base point).
    This variant skips it and instead returns (res, dbl_mask): res is WRONG
    (z3 == 0) exactly where dbl_mask is set, and the caller must detect the
    mask and redo the affected work on a complete path (ops.msm falls back
    to the doubling-safe full-prefix pipeline). Cancellation p == -q and
    both infinity cases remain exact here. The flag reads h and r straight
    off the formula's intermediates — zero extra field muls."""
    z1z1 = _sqr(p.z)
    u2 = _mul(q.x, z1z1)
    s2 = _mul(_mul(q.y, p.z), z1z1)
    h = _sub(u2, p.x)
    hh = _sqr(h)
    i = _dbl(_dbl(hh))
    j = _mul(h, i)
    r = _dbl(_sub(s2, p.y))
    v = _mul(p.x, i)
    x3 = _sub(_sub(_sqr(r), j), _dbl(v))
    y3 = _sub(_mul(r, _sub(v, x3)), _dbl(_mul(p.y, j)))
    z3 = _mul(_dbl(p.z), h)
    res = JPoints(x3, y3, z3)
    dbl = _is0(h) & _is0(r) & ~is_inf(p) & ~q.inf
    res = jselect(q.inf, p, res)
    res = jselect(is_inf(p), lift(q), res)
    return res, dbl


def jmadd(p: JPoints, q: APoints) -> JPoints:
    """Complete mixed add — dispatches to the fused Pallas kernel on TPU."""
    from curdleproofs_tpu.ops import pallas_g1

    if pallas_g1.enabled() and _lanes(p) >= pallas_g1.MIN_LANES:
        return pallas_g1.jmadd(p, q)
    return _jmadd_formulas(p, q)


def jneg(p: JPoints) -> JPoints:
    return JPoints(p.x, _neg(p.y), p.z)


def to_affine(p: JPoints) -> APoints:
    """Jacobian -> affine via batched Fermat inversion of Z."""
    zinv = ma.mont_inv(FQ_SPEC, p.z)
    zinv2 = _sqr(zinv)
    x = _mul(p.x, zinv2)
    y = _mul(p.y, _mul(zinv, zinv2))
    return APoints(x, y, is_inf(p))


# ---------------------------------------------------------------------------
# scalar multiplication / reduction
# ---------------------------------------------------------------------------


def scalar_bit(scalars, t):
    """Bit t (traced index) of canonical (16, *B) Fr limbs -> (*B,) uint32."""
    limb = lax.dynamic_index_in_dim(scalars, t // 16, axis=0, keepdims=False)
    return (limb >> (t % 16).astype(jnp.uint32)) & jnp.uint32(1)


def scalar_mul(points: APoints, scalars) -> JPoints:
    """Per-lane k_i * P_i, MSB-first double-and-add over 255 fixed steps.

    scalars: (16, *B) canonical (non-Montgomery) Fr limbs.
    Dispatches to the fully-fused Pallas ladder kernel on TPU (the whole
    255-step loop runs in VMEM).
    """
    from curdleproofs_tpu.ops import pallas_g1

    if pallas_g1.enabled() and _lanes_a(points) >= pallas_g1.MIN_LANES:
        return pallas_g1.scalar_mul(points, scalars)
    return _scalar_mul_xla(points, scalars)


def _lanes_a(a: APoints) -> int:
    n = 1
    for d in a.x.shape[1:]:
        n *= d
    return n


def _scalar_mul_xla(points: APoints, scalars) -> JPoints:
    batch_shape = points.x.shape[1:]
    acc0 = jinf(batch_shape)

    def body(acc, t):
        acc = jdbl(acc)
        bit = scalar_bit(scalars, t)
        cand = jmadd(acc, points)
        acc = jselect(bit == 1, cand, acc)
        return acc, None

    ts = jnp.arange(FR_BITS - 1, -1, -1, dtype=jnp.int32)
    acc, _ = lax.scan(body, acc0, ts)
    return acc


def tree_reduce(p: JPoints) -> JPoints:
    """Sum a (24, N) Jacobian vector down to a single point (N power of two
    after internal padding), via log2(N) rounds of halving adds."""
    n = p.x.shape[-1]
    if n == 1:
        return JPoints(p.x[..., 0], p.y[..., 0], p.z[..., 0])
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = jinf((m - n,))
        p = JPoints(
            jnp.concatenate([p.x, pad.x], axis=-1),
            jnp.concatenate([p.y, pad.y], axis=-1),
            jnp.concatenate([p.z, pad.z], axis=-1),
        )
    while m > 1:
        m //= 2
        lo = JPoints(p.x[..., :m], p.y[..., :m], p.z[..., :m])
        hi = JPoints(p.x[..., m:], p.y[..., m:], p.z[..., m:])
        p = jadd(lo, hi)
    return JPoints(p.x[..., 0], p.y[..., 0], p.z[..., 0])


# ---------------------------------------------------------------------------
# host <-> device packing
# ---------------------------------------------------------------------------

import jax as _jax


@_jax.jit
def _to_affine_jit(p: JPoints) -> APoints:
    return to_affine(p)


@_jax.jit
def _pack72(x, y, z):
    return jnp.concatenate([x, y, z], axis=0)


def jpoints_to_host_packed(p: JPoints) -> List[G1]:
    """jpoints_to_host via ONE host transfer instead of three.

    np.asarray(x), np.asarray(y), np.asarray(z) are three separate device
    round trips; the axon tunnel charges ~29 ms fixed latency per transfer,
    so for the handful-of-points results every MSM ends with (window totals,
    bucket sums) the latency dominates the bytes 1000x. One device-side
    concat -> one (72, ...) transfer."""
    arr = np.asarray(_pack72(p.x, p.y, p.z))
    return jpoints_to_host(JPoints(arr[:24], arr[24:48], arr[48:]))


def jpoints_to_host(p: JPoints) -> List[G1]:
    """Normalize Jacobian device points ((24,) or (24, n)) to host G1.

    The affine conversion happens host-side in exact int arithmetic — a
    handful of modmuls per point — instead of a 380-step batched Fermat
    inversion on device; device outputs stay Jacobian."""
    pmod = FQ_SPEC.modulus
    rinv = pow(FQ_SPEC.r_mod, -1, pmod)
    single = p.x.ndim == 1
    xs = limbs_to_ints(np.asarray(p.x))
    ys = limbs_to_ints(np.asarray(p.y))
    zs = limbs_to_ints(np.asarray(p.z))
    if single:
        xs, ys, zs = [xs], [ys], [zs]
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(G1.identity())
            continue
        # take coords out of Montgomery, then normalize the Jacobian triple
        x, y, z = x * rinv % pmod, y * rinv % pmod, z * rinv % pmod
        zinv = pow(z, -1, pmod)
        zinv2 = zinv * zinv % pmod
        out.append(G1(x * zinv2 % pmod, y * zinv2 % pmod * zinv % pmod))
    return out


def pack_points(points: List[G1]) -> APoints:
    """Host G1 list -> device affine struct (Montgomery form)."""
    R = FQ_SPEC.r_mod
    p = FQ_SPEC.modulus
    xs = [pt.x * R % p if not pt.inf else 0 for pt in points]
    ys = [pt.y * R % p if not pt.inf else 0 for pt in points]
    inf = np.array([pt.inf for pt in points], dtype=bool)
    return APoints(
        jnp.asarray(ints_to_limbs(xs, FQ_LIMBS)),
        jnp.asarray(ints_to_limbs(ys, FQ_LIMBS)),
        jnp.asarray(inf),
    )


def unpack_points(a: APoints) -> List[G1]:
    """Device affine struct -> host G1 list (out of Montgomery form)."""
    p = FQ_SPEC.modulus
    rinv = pow(FQ_SPEC.r_mod, -1, p)
    xs = limbs_to_ints(np.asarray(a.x))
    ys = limbs_to_ints(np.asarray(a.y))
    inf = np.asarray(a.inf)
    single = a.x.ndim == 1
    if single:
        xs, ys, inf = [xs], [ys], [inf]
    out = []
    for x, y, i in zip(xs, ys, np.atleast_1d(inf)):
        out.append(G1.identity() if bool(i) else G1(x * rinv % p, y * rinv % p))
    return out


def pack_scalars(scalars: List[Fr]) -> jnp.ndarray:
    """Host Fr list -> (16, N) canonical limb array."""
    return jnp.asarray(ints_to_limbs([s.v for s in scalars], FR_LIMBS))


def unpack_scalars(arr) -> List[Fr]:
    vals = limbs_to_ints(np.asarray(arr))
    if isinstance(vals, int):
        return [Fr(vals)]
    return [Fr(v) for v in vals]
