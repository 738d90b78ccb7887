"""Branchless multi-limb modular arithmetic kernels (JAX, TPU-first).

Field elements are (L, *batch) uint32 arrays of 16-bit limbs (limb-major; see
ops.fieldspec). All functions are shape-polymorphic over the batch dims, free
of data-dependent control flow, and safe under jit/vmap/shard_map.

Algorithm notes
  * mont_mul: operand-scanning wide multiply with split lo/hi column
    accumulation (each column bounded < 2^23, comfortably inside uint32),
    followed by word-by-word Montgomery reduction with carries threaded
    through the pivot column only — the classic CIOS dataflow restructured so
    every step is a full-width vector op over the batch axis.
  * carry/borrow ripples are sequential over the (static, small) limb axis
    but fully vectorized over the batch axis, which is where the parallelism
    lives on the 8x128 VPU.

This replaces the reference's per-element Rust arkworks field calls
(py_arkworks_bls12381-stubs/__init__.pyi:32-54) with batched device kernels.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
from jax import lax

from curdleproofs_tpu.ops.fieldspec import LIMB_BITS, LIMB_MASK, FieldSpec

import os

_U32 = jnp.uint32
# Plain Python ints: they inline as jaxpr literals, which keeps kernel bodies
# free of captured constant arrays (a Pallas requirement).
_MASK = LIMB_MASK
_SHIFT = LIMB_BITS

# Graph-size/performance switch: "loop" builds tiny graphs (lax.scan/fori over
# the limb axis — fast compiles, the right default off-TPU), "unroll" builds
# fully unrolled limb graphs XLA can fuse aggressively. The Pallas kernels
# force unrolled mode inside their bodies (everything lives in VMEM there).
UNROLL = os.environ.get("CURDLEPROOFS_LIMB_UNROLL", "0") == "1"

import contextlib


@contextlib.contextmanager
def force_unroll(value: bool = True):
    """Trace-time override of the limb-loop unrolling mode."""
    global UNROLL
    prev = UNROLL
    UNROLL = value
    try:
        yield
    finally:
        UNROLL = prev


def _const(v) -> jnp.ndarray:
    return jnp.asarray(v, dtype=_U32)


# Trace-time overrides: inside Pallas kernel bodies constant limb vectors
# (modulus, Montgomery one, ...) must come in as kernel arguments instead of
# captured constant arrays. Keys: "<specname>_mod", "fq_one_mont", ...
_CONST_OVERRIDE: dict = {}


@contextlib.contextmanager
def const_override(**arrays):
    _CONST_OVERRIDE.update(arrays)
    try:
        yield
    finally:
        for k in arrays:
            del _CONST_OVERRIDE[k]


def mod_override(spec: FieldSpec, mod_arr):
    return const_override(**{f"{spec.name}_mod": mod_arr})


def get_const(key: str, default_np):
    """Overridable constant limb vector (L,)."""
    ov = _CONST_OVERRIDE.get(key)
    return ov if ov is not None else _const(default_np)


def in_kernel(spec: FieldSpec) -> bool:
    return f"{spec.name}_mod" in _CONST_OVERRIDE


def _mod_vec(spec: FieldSpec, ndim: int):
    """(L, 1, ..) modulus limb vector broadcastable against (L, *B) values."""
    return get_const(f"{spec.name}_mod", spec.mod_limbs).reshape(
        (spec.nlimbs,) + (1,) * (ndim - 1)
    )


def _ripple_carry(cols) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalize L column accumulators (< 2^32) into 16-bit limbs.
    cols: (L, *B) array or list of (*B,) arrays.
    Returns ((L, *B) limbs, carry-out (*B,))."""
    if isinstance(cols, (list, tuple)):
        cols = jnp.stack(cols)
    if UNROLL:
        out = []
        carry = jnp.zeros_like(cols[0])
        for c in cols:
            v = c + carry
            out.append(v & _MASK)
            carry = v >> _SHIFT
        return jnp.stack(out), carry

    def body(carry, col):
        v = col + carry
        return v >> _SHIFT, v & _MASK

    carry, limbs = lax.scan(body, jnp.zeros_like(cols[0]), cols)
    return limbs, carry


def _sub_borrow(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Limbwise a - b with borrow ripple. Returns ((L, *B) diff, borrow (*B,))."""
    base = 1 << LIMB_BITS  # head-room term: v = a + 2^16 - b - borrow >= 0
    if UNROLL:
        L = a.shape[0]
        out = []
        borrow = jnp.zeros_like(a[0])
        for i in range(L):
            v = a[i] + base - b[i] - borrow
            out.append(v & _MASK)
            borrow = 1 - (v >> _SHIFT)
        return jnp.stack(out), borrow

    def body(borrow, ab):
        ai, bi = ab
        v = ai + base - bi - borrow
        return 1 - (v >> _SHIFT), v & _MASK

    bb = jnp.broadcast_to(b, a.shape)
    borrow, diff = lax.scan(body, jnp.zeros_like(a[0]), (a, bb))
    return diff, borrow


def add(spec: FieldSpec, a, b):
    """(a + b) mod p, canonical in/out."""
    mod = _mod_vec(spec, a.ndim)
    s, c = _ripple_carry(list(a + b))
    d, brw = _sub_borrow(s, mod)
    use_d = (c == 1) | (brw == 0)
    return jnp.where(use_d, d, s)


def sub(spec: FieldSpec, a, b):
    """(a - b) mod p, canonical in/out."""
    mod = _mod_vec(spec, a.ndim)
    d, brw = _sub_borrow(a, b)
    d2, _ = _ripple_carry(list(d + mod))
    return jnp.where(brw == 1, d2, d)


def neg(spec: FieldSpec, a):
    """(-a) mod p."""
    return sub(spec, jnp.zeros_like(a), a)


def double(spec: FieldSpec, a):
    return add(spec, a, a)


def is_zero(spec: FieldSpec, a):
    """Boolean mask (*B,): a == 0 (canonical representation assumed)."""
    return jnp.all(a == 0, axis=0)


def eq(spec: FieldSpec, a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """Elementwise field select: mask (*B,) -> a where True else b."""
    return jnp.where(mask[None, ...], a, b)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: a * b * R^{-1} mod p, canonical in/out.

    a, b: (L, *B) uint32 16-bit limbs in Montgomery form (or any canonical
    residues — the function is just a modmul up to the R^{-1} factor).
    Column accumulators stay < 2^23 (L<=24 lo+hi 16-bit terms per column plus
    pivot carries), well inside uint32.
    """
    if in_kernel(spec):
        # inside a Pallas kernel body: no scatter/DUS primitives available,
        # use the pure-elementwise column-list formulation
        return _mont_mul_cols(spec, a, b)
    if UNROLL:
        return _mont_mul_unrolled(spec, a, b)
    return _mont_mul_looped(spec, a, b)


def _shifted_acc(t, rows, offset: int, total: int):
    """t += rows placed at column `offset` — ONE vectorized add via
    zero-extension (static concatenate; no scatter, Pallas-lowerable).
    rows: (R, *B); t: (total, *B)."""
    R = rows.shape[0]
    zshape = lambda n: (n,) + rows.shape[1:]  # noqa: E731
    parts = []
    if offset:
        parts.append(jnp.zeros(zshape(offset), dtype=rows.dtype))
    parts.append(rows)
    tail = total - offset - R
    if tail:
        parts.append(jnp.zeros(zshape(tail), dtype=rows.dtype))
    return t + jnp.concatenate(parts, axis=0)


# In-kernel Montgomery-product formulation:
#   "cols"  — round-2 form: two full-width shifted adds per partial product
#   "cols2" — lo/hi halves combined into ONE (L+1)-row contribution block
#             before the full-width placement add, and the reduction pivot
#             carry deferred into the next step's contribution: ~40% fewer
#             vector-add rows per product (measured on-TPU via
#             benchmarks/micro_scan_sel.py)
#   "mxu"   — cols2 wide product + the REDC reduction's two BY-CONSTANT
#             multi-limb products (x N' mod R and m x N) offloaded to the
#             MXU as banded-constant-matrix one-hot-style exact bf16 dots
#             (see _mont_redc_mxu) — roughly halves the VPU work per
#             product while the otherwise-idle MXU absorbs the rest
MULFORM = os.environ.get("CURDLEPROOFS_MULFORM", "cols2")


@contextlib.contextmanager
def mulform_override(value: str):
    """Trace-time override of the in-kernel Montgomery product form."""
    global MULFORM
    prev = MULFORM
    MULFORM = value
    try:
        yield
    finally:
        MULFORM = prev


def _mont_mul_cols(spec: FieldSpec, a, b):
    if MULFORM == "mxu":
        return _mont_mul_mxu(spec, a, b)
    if MULFORM == "cols2":
        return _mont_mul_cols2(spec, a, b)
    return _mont_mul_cols1(spec, a, b)


def _mont_mul_cols1(spec: FieldSpec, a, b):
    """Same dataflow as _mont_mul_unrolled, but column accumulation happens
    on ONE (2L+1, *B) array with whole-vector shifted adds instead of .at[]
    scatters or per-column scalar graphs — Pallas-lowerable AND ~6x fewer
    jaxpr equations than the former per-column formulation (Mosaic compile
    time of the fused kernels scales with equation count)."""
    L = spec.nlimbs
    n0inv = spec.n0inv
    modv = _mod_vec(spec, a.ndim)
    T = 2 * L + 1

    t = jnp.zeros((T,) + a.shape[1:], dtype=_U32)
    for i in range(L):
        p = a[i][None, ...] * b  # (L, *B)
        t = _shifted_acc(t, p & _MASK, i, T)
        t = _shifted_acc(t, p >> _SHIFT, i + 1, T)

    for i in range(L):
        m = (t[i] * n0inv) & _MASK
        pm = m[None, ...] * modv  # (L, *B)
        t = _shifted_acc(t, pm & _MASK, i, T)
        t = _shifted_acc(t, pm >> _SHIFT, i + 1, T)
        # t[i] is now ≡ 0 mod 2^16; push its carry into the pivot column
        t = _shifted_acc(t, (t[i] >> _SHIFT)[None, ...], i + 1, T)

    res, carry = _ripple_carry(t[L : 2 * L])
    top = t[2 * L] + carry
    d, brw = _sub_borrow(res, jnp.broadcast_to(modv, res.shape))
    use_d = (top > 0) | (brw == 0)
    return jnp.where(use_d, d, res)


def _mont_mul_cols2(spec: FieldSpec, a, b):
    """_mont_mul_cols with the lo/hi product halves combined into one
    (L+1)-row contribution before the full-width placement (halves the
    (2L+1)-row adds of the wide phase) and the reduction's pivot carry
    DEFERRED: column i's carry rides into step i+1's m-computation and
    contribution block instead of its own full-width add (drops the
    reduction phase from 3 full-width adds per step to 1)."""
    L = spec.nlimbs
    n0inv = spec.n0inv
    modv = _mod_vec(spec, a.ndim)
    T = 2 * L + 1
    zrow_shape = (1,) + a.shape[1:]

    t = jnp.zeros((T,) + a.shape[1:], dtype=_U32)
    for i in range(L):
        p = a[i][None, ...] * b  # (L, *B)
        zrow = jnp.zeros(zrow_shape, dtype=_U32)
        contrib = jnp.concatenate([p & _MASK, zrow], axis=0) + jnp.concatenate(
            [zrow, p >> _SHIFT], axis=0
        )  # (L+1, *B)
        t = _shifted_acc(t, contrib, i, T)

    carry = jnp.zeros(a.shape[1:], dtype=_U32)
    for i in range(L):
        ti = t[i] + carry
        m = (ti * n0inv) & _MASK
        pm = m[None, ...] * modv  # (L, *B)
        lo = pm & _MASK
        hi = pm >> _SHIFT
        # column i zeroes out: ti + lo[0] ≡ 0 (mod 2^16) by choice of m
        carry = (ti + lo[0]) >> _SHIFT
        zrow = jnp.zeros(zrow_shape, dtype=_U32)
        contrib = jnp.concatenate([lo[1:], zrow], axis=0) + hi  # (L, *B)
        t = _shifted_acc(t, contrib, i + 1, T)

    cols = [t[L] + carry] + [t[L + j] for j in range(1, L)]
    res, carry2 = _ripple_carry(cols)
    top = t[2 * L] + carry2
    d, brw = _sub_borrow(res, jnp.broadcast_to(modv, res.shape))
    use_d = (top > 0) | (brw == 0)
    return jnp.where(use_d, d, res)


# ---------------------------------------------------------------------------
# MXU-assisted Montgomery product ("mxu" MULFORM).
#
# REDC splits a Montgomery product into one variable*variable wide product
# (VPU work, unavoidable) and two multi-limb products BY CONSTANTS:
#
#     m = (T mod R) * N'  mod R      (N' = -N^{-1} mod R)
#     t = (T + m * N) / R
#
# A multi-limb product by a constant is a linear map of the limb vector —
# i.e. a matmul against a banded constant matrix. Splitting operands into
# bytes makes every matrix entry and input < 256 (exact in bf16) and every
# output column a sum of <= 144 byte*byte terms < 2^24 (exact in f32
# accumulation), so the MXU computes these products BIT-EXACTLY, the same
# trick as the one-hot gather (ops.gather). The VPU keeps only the wide
# product, three short carry ripples and the byte splits — roughly half its
# former work — while the dots ride the otherwise-idle MXU.
#
# Numeric bounds, verified end to end:
#   * wide-product columns t_j < 48 * 2^16 = 2^21.6  -> 3 exact bytes each;
#     fed to the m-matmul UNNORMALIZED (skips one ripple): output stays
#     congruent mod R because dropped byte-columns >= 2L are multiples of R.
#   * m-matmul terms: <= 72 * 255^2 < 2^23 — exact in f32.
#   * m is normalized by one carry ripple with the top carry DROPPED,
#     giving exactly (T * N') mod R < R — required for the t < 2N bound.
#   * mN-matmul terms: <= 48 * 255^2 < 2^22 — exact in f32.
#   * 16-bit recombined columns < 2^31 (pair-combine) and < 2^30.1 (mN + T)
#     — no uint32 overflow anywhere.
# ---------------------------------------------------------------------------


def _int_to_bytes_vec(v: int, nbytes: int):
    import numpy as np

    return [(v >> (8 * i)) & 0xFF for i in range(nbytes)]


@functools.lru_cache(maxsize=None)
def mxu_mats_np(spec: FieldSpec):
    """Banded byte-level constant matrices for the REDC dots.

    M1 ((2L, 3L) — m = T_lo * N' mod R): input row r = 3j + b is byte b of
    UNNORMALIZED wide column j (weight 2^(16j + 8b)); output s is byte-col s
    of the product, truncated at 2L byte-columns (== mod R).
    M2 ((4L, 2L) — m * N full product): input row r is byte r of normalized
    m. float32; cast to bf16 at use site (all entries < 256, exact)."""
    import numpy as np

    L = spec.nlimbs
    nb = 2 * L
    npr = (-pow(spec.modulus, -1, 1 << (16 * L))) % (1 << (16 * L))
    npb = _int_to_bytes_vec(npr, nb)
    m1 = np.zeros((nb, 3 * L), np.float32)
    for j in range(L):
        for bi in range(3):
            pos = 2 * j + bi
            for s in range(pos, nb):
                k = s - pos
                if k < nb:
                    m1[s, 3 * j + bi] = npb[k]
    nbv = _int_to_bytes_vec(spec.modulus, nb)
    m2 = np.zeros((4 * L, nb), np.float32)
    for r in range(nb):
        for k in range(nb):
            m2[r + k, r] = nbv[k]
    return m1, m2


def _mxu_mats(spec: FieldSpec):
    """(M1, M2) as bf16 jax arrays — overridable so Pallas kernel bodies can
    thread them in as kernel arguments (keys "<spec>_mxu1"/"<spec>_mxu2")."""
    m1np, m2np = mxu_mats_np(spec)
    m1 = _CONST_OVERRIDE.get(f"{spec.name}_mxu1")
    m2 = _CONST_OVERRIDE.get(f"{spec.name}_mxu2")
    if m1 is None:
        m1 = jnp.asarray(m1np, dtype=jnp.bfloat16)
    if m2 is None:
        m2 = jnp.asarray(m2np, dtype=jnp.bfloat16)
    return m1, m2


def _bf16(x_u32):
    # Mosaic has no direct u32 -> bf16 cast; i32 -> f32 -> bf16, exact < 256
    return x_u32.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _mont_redc_mxu(spec: FieldSpec, t):
    """REDC of wide-product column accumulators t ((2L+1, *B) u32, columns
    < 2^23) via the two banded-constant MXU dots. Returns canonical limbs."""
    L = spec.nlimbs
    modv = _mod_vec(spec, t.ndim)
    m1, m2 = _mxu_mats(spec)
    batch = t.shape[1:]
    flat = 1
    for d in batch:
        flat *= d

    # T_lo bytes (3 per unnormalized column), (3L, *B)
    tl = t[:L]
    tb = jnp.stack(
        [tl & 0xFF, (tl >> _SHIFT // 2) & 0xFF, tl >> _SHIFT], axis=1
    ).reshape((3 * L,) + batch)
    mcols = jnp.dot(
        m1, _bf16(tb).reshape(3 * L, flat),
        preferred_element_type=jnp.float32,
    )  # (2L, flat) byte-cols of m, < 2^23
    mcols = mcols.astype(jnp.int32).astype(jnp.uint32).reshape((2 * L,) + batch)
    # pair-combine to 16-bit columns (< 2^31), ripple, DROP top carry (mod R)
    mlimb, _ = _ripple_carry(
        [mcols[2 * i] + (mcols[2 * i + 1] << jnp.uint32(8)) for i in range(L)]
    )
    mb = jnp.stack([mlimb & 0xFF, mlimb >> 8], axis=1).reshape((2 * L,) + batch)
    pcols = jnp.dot(
        m2, _bf16(mb).reshape(2 * L, flat),
        preferred_element_type=jnp.float32,
    )  # (4L, flat) byte-cols of m*N, < 2^22
    pcols = pcols.astype(jnp.int32).astype(jnp.uint32).reshape((4 * L,) + batch)
    # u = T + m*N in 16-bit columns (< 2^30.1)
    mn = [pcols[2 * i] + (pcols[2 * i + 1] << jnp.uint32(8)) for i in range(2 * L)]
    u = [t[i] + mn[i] for i in range(2 * L)] + [t[2 * L]]
    # low half is divisible by 2^(16L); ripple it for the carry only
    carry = jnp.zeros_like(u[0])
    if UNROLL:
        for i in range(L):
            carry = (u[i] + carry) >> _SHIFT
    else:
        carry, _ = lax.scan(
            lambda c, col: ((col + c) >> _SHIFT, None),
            carry,
            jnp.stack(u[:L]),
        )
    res, carry2 = _ripple_carry([u[L] + carry] + u[L + 1 : 2 * L])
    top = u[2 * L] + carry2
    d, brw = _sub_borrow(res, jnp.broadcast_to(modv, res.shape))
    use_d = (top > 0) | (brw == 0)
    return jnp.where(use_d, d, res)


def _mont_wide_cols(spec: FieldSpec, a, b):
    """Wide product a*b as (2L+1, *B) u32 column accumulators (< 2^21.6):
    the cols2 wide phase standalone."""
    L = spec.nlimbs
    T = 2 * L + 1
    zrow_shape = (1,) + a.shape[1:]
    t = jnp.zeros((T,) + a.shape[1:], dtype=_U32)
    for i in range(L):
        p = a[i][None, ...] * b  # (L, *B)
        zrow = jnp.zeros(zrow_shape, dtype=_U32)
        contrib = jnp.concatenate([p & _MASK, zrow], axis=0) + jnp.concatenate(
            [zrow, p >> _SHIFT], axis=0
        )  # (L+1, *B)
        t = _shifted_acc(t, contrib, i, T)
    return t


def _mont_sqr_wide_cols(spec: FieldSpec, a):
    """Wide square a*a as (2L+1, *B) u32 column accumulators (< 2^22.6):
    the cols2 squaring wide phase standalone (off-diagonals doubled)."""
    L = spec.nlimbs
    T = 2 * L + 1
    zrow_shape = (1,) + a.shape[1:]
    t = jnp.zeros((T,) + a.shape[1:], dtype=_U32)
    for i in range(L):
        zrow = jnp.zeros(zrow_shape, dtype=_U32)
        if i + 1 < L:
            p = a[i][None, ...] * a[i + 1 :]
            lo = (p & _MASK) << jnp.uint32(1)
            hi = (p >> _SHIFT) << jnp.uint32(1)
            contrib = jnp.concatenate([lo, zrow], axis=0) + jnp.concatenate(
                [zrow, hi], axis=0
            )
            t = _shifted_acc(t, contrib, 2 * i + 1, T)
        d = a[i] * a[i]
        t = _shifted_acc(t, jnp.stack([d & _MASK, d >> _SHIFT]), 2 * i, T)
    return t


def _mont_mul_mxu(spec: FieldSpec, a, b):
    return _mont_redc_mxu(spec, _mont_wide_cols(spec, a, b))


def _mont_sqr_mxu(spec: FieldSpec, a):
    return _mont_redc_mxu(spec, _mont_sqr_wide_cols(spec, a))


def _mont_mul_unrolled(spec: FieldSpec, a, b):
    L = spec.nlimbs
    n0inv = spec.n0inv  # python int -> jaxpr literal
    batch_shape = a.shape[1:]
    modv = _mod_vec(spec, a.ndim)

    # --- wide multiply: column accumulators t[0..2L] -----------------------
    t = jnp.zeros((2 * L + 1,) + batch_shape, dtype=_U32)
    for i in range(L):
        p = a[i][None, ...] * b  # (L, *B) full 32-bit products
        t = t.at[i : i + L].add(p & _MASK)
        t = t.at[i + 1 : i + L + 1].add(p >> _SHIFT)

    # --- Montgomery reduction: eliminate limbs 0..L-1 ----------------------
    for i in range(L):
        m = ((t[i] * n0inv) & _MASK)[None, ...]  # (1, *B)
        p = m * modv  # (L, *B)
        t = t.at[i : i + L].add(p & _MASK)
        t = t.at[i + 1 : i + L + 1].add(p >> _SHIFT)
        # t[i] is now ≡ 0 mod 2^16; push its carry into the pivot column
        t = t.at[i + 1].add(t[i] >> _SHIFT)

    return _mont_finish(t, L, modv)


def _mont_mul_looped(spec: FieldSpec, a, b):
    """Same dataflow as _mont_mul_unrolled but with the limb loops as
    lax.fori_loop — a ~20x smaller graph, the default off-TPU."""
    L = spec.nlimbs
    n0inv = spec.n0inv  # python int -> jaxpr literal
    batch_shape = a.shape[1:]
    modv = _mod_vec(spec, a.ndim)
    bb = jnp.broadcast_to(b, a.shape)
    zrow = jnp.zeros((1,) + batch_shape, dtype=_U32)
    modb = jnp.broadcast_to(modv, a.shape)

    def wide_body(i, t):
        ai = lax.dynamic_index_in_dim(a, i, axis=0, keepdims=True)  # (1, *B)
        p = ai * bb
        w = lax.dynamic_slice_in_dim(t, i, L + 1, axis=0)
        w = w + jnp.concatenate([p & _MASK, zrow], 0)
        w = w + jnp.concatenate([zrow, p >> _SHIFT], 0)
        return lax.dynamic_update_slice_in_dim(t, w, i, axis=0)

    t = jnp.zeros((2 * L + 1,) + batch_shape, dtype=_U32)
    t = lax.fori_loop(0, L, wide_body, t)

    def red_body(i, t):
        w = lax.dynamic_slice_in_dim(t, i, L + 1, axis=0)
        m = (w[0] * n0inv) & _MASK
        p = m[None, ...] * modb
        w = w + jnp.concatenate([p & _MASK, zrow], 0)
        w = w + jnp.concatenate([zrow, p >> _SHIFT], 0)
        w = w.at[1].add(w[0] >> _SHIFT)
        return lax.dynamic_update_slice_in_dim(t, w, i, axis=0)

    t = lax.fori_loop(0, L, red_body, t)
    return _mont_finish(t, L, modv)


def _mont_finish(t, L, modv):
    """Normalize the surviving upper half of the accumulator and reduce to
    [0, p). t[2L] + ripple carry < 2 by the Montgomery bound (t/R < 2p)."""
    res, carry = _ripple_carry(t[L : 2 * L])
    top = t[2 * L] + carry
    d, brw = _sub_borrow(res, modv)
    use_d = (top > 0) | (brw == 0)
    return jnp.where(use_d, d, res)


def mont_sqr(spec: FieldSpec, a):
    if in_kernel(spec):
        if MULFORM == "mxu":
            return _mont_sqr_mxu(spec, a)
        if MULFORM == "cols2":
            return _mont_sqr_cols2(spec, a)
        return _mont_sqr_cols(spec, a)
    return mont_mul(spec, a, a)


def _mont_sqr_cols2(spec: FieldSpec, a):
    """_mont_sqr_cols with combined lo/hi contribution blocks and the
    deferred reduction pivot carry (see _mont_mul_cols2)."""
    L = spec.nlimbs
    n0inv = spec.n0inv
    modv = _mod_vec(spec, a.ndim)
    T = 2 * L + 1
    zrow_shape = (1,) + a.shape[1:]

    t = jnp.zeros((T,) + a.shape[1:], dtype=_U32)
    for i in range(L):
        zrow = jnp.zeros(zrow_shape, dtype=_U32)
        if i + 1 < L:
            # off-diagonal: 2 * a_i * a_j for j > i, lo at 2i+1+r, hi at
            # 2i+2+r -> one (L-i, *B) block placed at 2i+1
            p = a[i][None, ...] * a[i + 1 :]
            lo = (p & _MASK) << jnp.uint32(1)
            hi = (p >> _SHIFT) << jnp.uint32(1)
            contrib = jnp.concatenate([lo, zrow], axis=0) + jnp.concatenate(
                [zrow, hi], axis=0
            )
            t = _shifted_acc(t, contrib, 2 * i + 1, T)
        # diagonal a_i^2: lo at 2i, hi at 2i+1 -> one (2, *B) block
        d = a[i] * a[i]
        t = _shifted_acc(
            t, jnp.stack([d & _MASK, d >> _SHIFT]), 2 * i, T
        )

    carry = jnp.zeros(a.shape[1:], dtype=_U32)
    for i in range(L):
        ti = t[i] + carry
        m = (ti * n0inv) & _MASK
        pm = m[None, ...] * modv
        lo = pm & _MASK
        hi = pm >> _SHIFT
        carry = (ti + lo[0]) >> _SHIFT
        zrow = jnp.zeros(zrow_shape, dtype=_U32)
        contrib = jnp.concatenate([lo[1:], zrow], axis=0) + hi
        t = _shifted_acc(t, contrib, i + 1, T)

    cols = [t[L] + carry] + [t[L + j] for j in range(1, L)]
    res, carry2 = _ripple_carry(cols)
    top = t[2 * L] + carry2
    d2, brw = _sub_borrow(res, jnp.broadcast_to(modv, res.shape))
    use_d = (top > 0) | (brw == 0)
    return jnp.where(use_d, d2, res)


def _mont_sqr_cols(spec: FieldSpec, a):
    """Squaring-specialized Montgomery product for Pallas kernel bodies:
    off-diagonal limb products computed once and doubled (~300 multiplies vs
    576), accumulated with whole-vector shifted adds. Column bounds:
    <= ~24 doubled 17-bit terms + diagonal + reduction terms < 2^23."""
    L = spec.nlimbs
    n0inv = spec.n0inv
    modv = _mod_vec(spec, a.ndim)
    T = 2 * L + 1

    t = jnp.zeros((T,) + a.shape[1:], dtype=_U32)
    for i in range(L):
        # off-diagonal: 2 * a_i * a_j for j > i (shift-doubled 16-bit halves)
        if i + 1 < L:
            p = a[i][None, ...] * a[i + 1 :]
            t = _shifted_acc(t, (p & _MASK) << jnp.uint32(1), 2 * i + 1, T)
            t = _shifted_acc(t, (p >> _SHIFT) << jnp.uint32(1), 2 * i + 2, T)
        # diagonal: a_i^2
        d = (a[i] * a[i])[None, ...]
        t = _shifted_acc(t, d & _MASK, 2 * i, T)
        t = _shifted_acc(t, d >> _SHIFT, 2 * i + 1, T)

    for i in range(L):
        m = (t[i] * n0inv) & _MASK
        pm = m[None, ...] * modv
        t = _shifted_acc(t, pm & _MASK, i, T)
        t = _shifted_acc(t, pm >> _SHIFT, i + 1, T)
        t = _shifted_acc(t, (t[i] >> _SHIFT)[None, ...], i + 1, T)

    res, carry = _ripple_carry(t[L : 2 * L])
    top = t[2 * L] + carry
    d2, brw = _sub_borrow(res, jnp.broadcast_to(modv, res.shape))
    use_d = (top > 0) | (brw == 0)
    return jnp.where(use_d, d2, res)


def to_mont(spec: FieldSpec, a):
    """Canonical residue -> Montgomery form (multiply by R^2)."""
    r2 = _const(spec.r2_limbs).reshape((spec.nlimbs,) + (1,) * (a.ndim - 1))
    return mont_mul(spec, a, jnp.broadcast_to(r2, a.shape))

def from_mont(spec: FieldSpec, a):
    """Montgomery form -> canonical residue (multiply by 1)."""
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(spec, a, one)


def mont_pow_const(spec: FieldSpec, a, e: int):
    """a^e (Montgomery in/out) for a static exponent, via an MSB-first
    square-and-multiply lax.scan (graph stays O(1) montmuls)."""
    if e == 0:
        one = _const(spec.one_mont).reshape((spec.nlimbs,) + (1,) * (a.ndim - 1))
        return jnp.broadcast_to(one, a.shape)
    bits = [(e >> i) & 1 for i in range(e.bit_length())][::-1]  # MSB first
    bits_arr = jnp.asarray(bits, dtype=jnp.uint32)

    def body(acc, bit):
        acc = mont_sqr(spec, acc)
        acc_mul = mont_mul(spec, acc, a)
        acc = jnp.where(bit > 0, acc_mul, acc)
        return acc, None

    # first bit is always 1: start from a
    acc, _ = lax.scan(body, a, bits_arr[1:])
    return acc


def mont_inv(spec: FieldSpec, a):
    """Batched modular inverse via Fermat (a^(p-2)); 0 -> 0.
    Montgomery in/out."""
    return mont_pow_const(spec, a, spec.modulus - 2)
