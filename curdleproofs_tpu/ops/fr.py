"""Batched scalar-field (Fr) vector operations on device.

The protocol's O(n) scalar work — challenge power ladders, IPA verification
scalars vec_s (ipa.py:178-184), folding combinations — is tiny for ell=124
and runs host-side, but batched verification at large scale makes it O(n
log n) Fr multiplies; these kernels keep that work on device using the same
generic limb engine as Fq (ops.modarith with FR_SPEC).

Values are (16, n) canonical limb arrays (non-Montgomery at the API edge;
Montgomery internally for multiplies).
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp

from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.ops import g1 as og
from curdleproofs_tpu.ops import modarith as ma
from curdleproofs_tpu.ops.fieldspec import FR_SPEC


@partial(jax.jit, static_argnames=("n",))
def _powers_device(base_m: jnp.ndarray, n: int):
    """[base^1 .. base^n] in Montgomery form via a log-depth doubling scan."""
    # powers[i] = base^(i+1): start with [base], repeatedly append
    # shifted-by-current-length products (prefix-doubling)
    acc = base_m  # (16, 1)
    top = base_m  # base^(len)
    while acc.shape[-1] < n:
        m = acc.shape[-1]
        ext = ma.mont_mul(FR_SPEC, acc, jnp.broadcast_to(top, acc.shape))
        acc = jnp.concatenate([acc, ext], axis=-1)  # base^1..base^(2m)
        top = ext[:, -1:]
    return acc[:, :n]


def powers(base: Fr, n: int) -> List[Fr]:
    """[base, base^2, ..., base^n] computed on device (log-depth)."""
    if n == 0:
        return []
    bm = ma.to_mont(FR_SPEC, og.pack_scalars([base]))
    out = ma.from_mont(FR_SPEC, _powers_device(bm, n))
    return og.unpack_scalars(out)


@partial(jax.jit, static_argnames=("n",))
def _vec_s_device(challenges_m: jnp.ndarray, n: int):
    """vec_s[i] = prod_{j in bits(i)} challenges[j] (big-endian bit order,
    ipa.py:178-184) — lg_n batched multiplies instead of n*lg_n scalar ones."""
    lg_n = challenges_m.shape[-1]
    one = jnp.broadcast_to(
        jnp.asarray(FR_SPEC.one_mont, dtype=jnp.uint32)[:, None], (16, n)
    )
    idx = jnp.arange(n, dtype=jnp.uint32)
    s = one
    for j in range(lg_n):
        bit = (idx >> jnp.uint32(lg_n - 1 - j)) & jnp.uint32(1)
        cj = jnp.broadcast_to(challenges_m[:, j : j + 1], (16, n))
        prod = ma.mont_mul(FR_SPEC, s, cj)
        s = jnp.where((bit == 1)[None, :], prod, s)
    return s


def verification_scalars_device(challenges: Sequence[Fr], n: int) -> List[Fr]:
    """Device computation of the IPA/same-msm vec_s (n can be large)."""
    lg_n = len(challenges)
    if (1 << lg_n) != n:
        raise ValueError("n must equal 2**len(challenges)")
    cm = ma.to_mont(FR_SPEC, og.pack_scalars(list(challenges)))
    out = ma.from_mont(FR_SPEC, _vec_s_device(cm, n))
    return og.unpack_scalars(out)


@jax.jit
def _inner_product_device(a_m: jnp.ndarray, b_m: jnp.ndarray):
    prod = ma.mont_mul(FR_SPEC, a_m, b_m)
    # log-depth tree reduction of modular adds
    m = prod.shape[-1]
    while m > 1:
        half = (m + 1) // 2
        lo = prod[:, :half]
        hi = prod[:, half:m]
        hi = jnp.pad(hi, ((0, 0), (0, half - hi.shape[-1])))
        prod = ma.add(FR_SPEC, lo, hi)
        m = half
    return prod[:, 0]


def inner_product(a: Sequence[Fr], b: Sequence[Fr]) -> Fr:
    """<a, b> mod r on device (host fr_inner_product is the oracle)."""
    if len(a) != len(b):
        raise ValueError("inner_product length mismatch")
    if not a:
        return Fr(0)
    am = ma.to_mont(FR_SPEC, og.pack_scalars(list(a)))
    bm = ma.to_mont(FR_SPEC, og.pack_scalars(list(b)))
    out = ma.from_mont(FR_SPEC, _inner_product_device(am, bm)[:, None])
    return og.unpack_scalars(out)[0]
