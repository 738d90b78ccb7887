"""Host-facing batched point-vector operations.

The protocol layer (models/) orchestrates with exact host `G1`/`Fr` objects;
every O(n) point operation is dispatched here, where vectors are packed into
limb arrays, processed by the jitted device kernels, and unpacked. Widths are
padded to powers of two (min 32) so each kernel compiles for a handful of
shapes only (persistently cached).

These are the TPU replacements for the reference's per-element loops:
  * fold_points       — ipa.py:142-151 / same_msm.py:122-131 fold rounds
  * scale_points      — grand_prod.py:62-71 beta-power basis rescaling,
                        curdleproofs.py:310-313 tracker re-randomization
  * msm (ops.msm)     — msm_accumulator.py:6-12 compute_MSM
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp

from curdleproofs_tpu.curve import G1
from curdleproofs_tpu.fields import Fr
from curdleproofs_tpu.ops import g1 as og
from curdleproofs_tpu.ops.g1 import APoints

# Minimum padded width: matches the Pallas small-tile width so protocol-sized
# vector ops always hit the fused kernels on TPU.
MIN_WIDTH = 128


def _pad_width(n: int) -> int:
    m = MIN_WIDTH
    while m < n:
        m *= 2
    return m


def _pack_padded(points: Sequence[G1], m: int) -> APoints:
    pts = list(points) + [G1.identity()] * (m - len(points))
    return og.pack_points(pts)


def _pack_scalars_padded(scalars: Sequence[Fr], m: int) -> jnp.ndarray:
    scs = list(scalars) + [Fr(0)] * (m - len(scalars))
    return og.pack_scalars(scs)


@jax.jit
def _scale_kernel(pts: APoints, scalars: jnp.ndarray):
    return og.scalar_mul(pts, scalars)


@jax.jit
def _fold_kernel(a: APoints, b: APoints, gamma: jnp.ndarray):
    gb = og.scalar_mul(b, jnp.broadcast_to(gamma, (gamma.shape[0], b.x.shape[-1])))
    return og.jmadd(gb, a)


@jax.jit
def _add_kernel(a: APoints, b: APoints):
    return og.jmadd(og.lift(a), b)


def scale_points(points: Sequence[G1], scalars: Sequence[Fr]) -> List[G1]:
    """[P_i * s_i] with per-point scalars, batched on device."""
    n = len(points)
    if n != len(scalars):
        raise ValueError("scale_points length mismatch")
    if n == 0:
        return []
    m = _pad_width(n)
    res = _scale_kernel(_pack_padded(points, m), _pack_scalars_padded(scalars, m))
    return og.jpoints_to_host(res)[:n]


def scale_points_common(points: Sequence[G1], k: Fr) -> List[G1]:
    """[P_i * k] with one common scalar (tracker re-randomization)."""
    return scale_points(points, [k] * len(points))


def fold_points(a: Sequence[G1], b: Sequence[G1], gamma: Fr) -> List[G1]:
    """[a_i + gamma * b_i] — the Bulletproofs-style fold round primitive."""
    n = len(a)
    if n != len(b):
        raise ValueError("fold_points length mismatch")
    if n == 0:
        return []
    m = _pad_width(n)
    res = _fold_kernel(
        _pack_padded(a, m), _pack_padded(b, m), og.pack_scalars([gamma])
    )
    return og.jpoints_to_host(res)[:n]


def fold_points_multi(
    a: Sequence[G1], b: Sequence[G1], gammas: Sequence[Fr]
) -> List[G1]:
    """[a_i + gammas_i * b_i] — fold with PER-ELEMENT scalars. Used by the
    lockstep batch prover, where K proofs' fold rounds merge into one
    dispatch and each segment carries its own challenge."""
    n = len(a)
    if n != len(b) or n != len(gammas):
        raise ValueError("fold_points_multi length mismatch")
    if n == 0:
        return []
    m = _pad_width(n)
    res = _fold_kernel(
        _pack_padded(a, m), _pack_padded(b, m), _pack_scalars_padded(gammas, m)
    )
    return og.jpoints_to_host(res)[:n]


def add_points(a: Sequence[G1], b: Sequence[G1]) -> List[G1]:
    """[a_i + b_i] elementwise."""
    n = len(a)
    if n != len(b):
        raise ValueError("add_points length mismatch")
    if n == 0:
        return []
    m = _pad_width(n)
    res = _add_kernel(_pack_padded(a, m), _pack_padded(b, m))
    return og.jpoints_to_host(res)[:n]
