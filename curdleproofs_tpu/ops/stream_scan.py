"""Streaming group-prefix-scan over digit-sorted point records.

Phase 1 of the host-sorted Pippenger MSM (ops.msm), replacing the ~35-level
Blelloch recursion of full Jacobian adds (ops.scan.inclusive_scan) with ONE
Pallas dispatch of work-optimal *mixed* adds:

  * The n sorted points of each window are laid out column-major over L
    lanes: lane l holds sorted ranks [l*T, (l+1)*T), the grid walks t = 0..T-1
    sequentially with the running per-lane prefix living in VMEM scratch.
    Each step is one complete Jacobian+affine mixed add (~11 Montgomery muls
    vs 16 for the full adds the level recursion needs) on L lanes — n mixed
    adds per window total, vs ~2.2n full adds before, with zero inter-level
    HBM round-trips or even/odd reshapes.
  * Per-lane totals come out as a (72, W, L) side output; a tiny Hillis-
    Steele scan over the L lanes (ops.scan._hs_scan) turns them into lane
    offsets, and bucket-boundary prefixes are reassembled as
    prefix[e] = local_prefix[e] + lane_offset[lane(e) - 1] — only the B-1
    boundary positions per window are materialized (ops.msm), never a
    globally-stitched prefix vector.

The reference computes every MSM as a serial point loop
(msm_accumulator.py:6-12); this kernel is part of its TPU replacement.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU memory spaces; absent on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from curdleproofs_tpu.ops import g1 as og
from curdleproofs_tpu.ops import modarith as ma
from curdleproofs_tpu.ops.pallas_g1 import _consts_arr, _interpret


def _vspec(shape, index_map):
    if _VMEM is None:
        return pl.BlockSpec(shape, index_map)
    return pl.BlockSpec(shape, index_map, memory_space=_VMEM)


def _const_spec2():
    """(24, 3) constant limb columns (see pallas_g1._const_spec), 2D grid."""
    return _vspec((24, 3), lambda w, t: (0, 0))


@functools.lru_cache(maxsize=None)
def _build_scan(W: int, T: int, L: int):
    """pallas_call: records (49, 1, W*T*L) [x limbs 0-23, y 24-47, inf 48,
    flat pos = w*T*L + t*L + l = sorted rank l*T + t of window w] ->
    (prefix (72, 1, W*T*L) same layout [X|Y|Z limb rows], lane totals
    (72, 1, W*L))."""

    def kernel(const_ref, rec_ref, pref_ref, tot_ref, accx, accy, accz):
        t = pl.program_id(1)
        rec = rec_ref[...]
        x = rec[:24, 0, :]
        y = rec[24:48, 0, :]
        infv = rec[48, 0, :] != 0
        with ma.force_unroll(), ma.const_override(
            fq_mod=const_ref[:, 0], fq_one_mont=const_ref[:, 1]
        ):
            first = t == 0
            zeros = jnp.zeros_like(x)
            # z == 0 encodes infinity, so the t == 0 "previous prefix" is
            # the all-zero triple and the complete madd yields lift(q)
            prev = og.JPoints(
                jnp.where(first, zeros, accx[...]),
                jnp.where(first, zeros, accy[...]),
                jnp.where(first, zeros, accz[...]),
            )
            res = og._jmadd_formulas(prev, og.APoints(x, y, infv))
        accx[...] = res.x
        accy[...] = res.y
        accz[...] = res.z
        out = jnp.concatenate([res.x, res.y, res.z], axis=0).reshape(72, 1, L)
        pref_ref[...] = out
        tot_ref[...] = out  # t is the minor grid axis: last write (t = T-1)
        # is the lane total

    def call(records):
        return pl.pallas_call(
            kernel,
            grid=(W, T),
            in_specs=[
                _const_spec2(),
                _vspec((49, 1, L), lambda w, t: (0, 0, w * T + t)),
            ],
            out_specs=[
                _vspec((72, 1, L), lambda w, t: (0, 0, w * T + t)),
                _vspec((72, 1, L), lambda w, t: (0, 0, w)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((72, 1, W * T * L), jnp.uint32),
                jax.ShapeDtypeStruct((72, 1, W * L), jnp.uint32),
            ],
            scratch_shapes=(
                [pltpu.VMEM((24, L), jnp.uint32)] * 3 if pltpu is not None else []
            ),
            interpret=_interpret(),
        )(_consts_arr(), records)

    return call


def pick_lanes(n: int) -> int:
    """Scan lane width: full VPU tiles, bounded by the vector length."""
    return min(512, n)


def scan_records(records: jnp.ndarray, W: int, T: int, L: int):
    """Per-lane streaming scan. records (49, W*T*L) u32 (see _build_scan).

    Returns (prefix (72, W, T*L), lane_totals (72, W, L)); prefix[.., w, p]
    is the inclusive within-lane prefix at flat position p = t*L + l, i.e.
    of sorted ranks [l*T, l*T + t] only.

    On TPU this is the single-dispatch Pallas kernel; elsewhere an exact
    lax.scan twin of the same semantics (the kernel itself is covered by a
    slow-marked interpreter test)."""
    from curdleproofs_tpu.ops import pallas_g1

    if pallas_g1.enabled():
        return scan_records_pallas(records, W, T, L)
    return _scan_records_xla(records, W, T, L)


def scan_records_pallas(records: jnp.ndarray, W: int, T: int, L: int):
    pref, tot = _build_scan(W, T, L)(records.reshape(49, 1, W * T * L))
    return pref.reshape(72, W, T * L), tot.reshape(72, W, L)


def _scan_records_xla(records: jnp.ndarray, W: int, T: int, L: int):
    rec = records.reshape(49, W, T, L)
    x, y, infv = rec[:24], rec[24:48], rec[48] != 0

    def step(acc, t):
        q = og.APoints(x[:, :, t], y[:, :, t], infv[:, t])
        res = og._jmadd_formulas(acc, q)
        return res, res

    acc_t, ys = jax.lax.scan(step, og.jinf((W, L)), jnp.arange(T))

    def re(a):  # (T, 24, W, L) -> (24, W, T*L)
        return jnp.moveaxis(a, 0, 2).reshape(24, W, T * L)

    pref = jnp.concatenate([re(ys.x), re(ys.y), re(ys.z)], axis=0)
    tot = jnp.concatenate([acc_t.x, acc_t.y, acc_t.z], axis=0)
    return pref, tot
