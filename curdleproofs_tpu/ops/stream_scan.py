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


import os as _os

# In-kernel Montgomery product form for the streaming scans ("cols2" or
# "mxu"). "mxu" offloads the REDC by-constant products to the MXU as exact
# banded bf16 dots (ops.modarith._mont_redc_mxu) — roughly half the VPU
# work per mixed add, with the otherwise-idle MXU absorbing the dots.
SCAN_MULFORM = _os.environ.get("CURDLEPROOFS_SCAN_MULFORM", "cols2")


def _mxu_specs_args(form: str):
    """Extra (specs, args) threading the banded REDC constant matrices into
    a kernel when form == "mxu" (Pallas bans captured constant arrays)."""
    if form != "mxu":
        return [], ()
    from curdleproofs_tpu.ops.fieldspec import FQ_SPEC

    m1np, m2np = ma.mxu_mats_np(FQ_SPEC)
    specs = [
        _vspec(m1np.shape, lambda w, t: (0, 0)),
        _vspec(m2np.shape, lambda w, t: (0, 0)),
    ]
    args = (
        jnp.asarray(m1np, dtype=jnp.bfloat16),
        jnp.asarray(m2np, dtype=jnp.bfloat16),
    )
    return specs, args


def _mxu_override(form: str, mxu_refs):
    """const_override kwargs for the matrices inside a kernel body."""
    if form != "mxu":
        return {}
    m1_ref, m2_ref = mxu_refs
    return {"fq_mxu1": m1_ref[...], "fq_mxu2": m2_ref[...]}


@functools.lru_cache(maxsize=None)
def _build_scan(W: int, T: int, L: int, form: str = "cols2"):
    """pallas_call: records (49, 1, W*T*L) [x limbs 0-23, y 24-47, inf 48,
    flat pos = w*T*L + t*L + l = sorted rank l*T + t of window w] ->
    (prefix (72, 1, W*T*L) same layout [X|Y|Z limb rows], lane totals
    (72, 1, W*L))."""

    def kernel(const_ref, *rest):
        if form == "mxu":
            mxu_refs, (rec_ref, pref_ref, tot_ref, accx, accy, accz) = (
                rest[:2],
                rest[2:],
            )
        else:
            mxu_refs = ()
            rec_ref, pref_ref, tot_ref, accx, accy, accz = rest
        t = pl.program_id(1)
        rec = rec_ref[...]
        x = rec[:24, 0, :]
        y = rec[24:48, 0, :]
        infv = rec[48, 0, :] != 0
        with ma.force_unroll(), ma.mulform_override(form), ma.const_override(
            fq_mod=const_ref[:, 0],
            fq_one_mont=const_ref[:, 1],
            **_mxu_override(form, mxu_refs),
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

    mxu_specs, mxu_args = _mxu_specs_args(form)

    def call(records):
        return pl.pallas_call(
            kernel,
            grid=(W, T),
            in_specs=[_const_spec2()]
            + mxu_specs
            + [_vspec((49, 1, L), lambda w, t: (0, 0, w * T + t))],
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
        )(_consts_arr(), *mxu_args, records)

    return call


@functools.lru_cache(maxsize=None)
def _build_scan_sel(W: int, T: int, L: int, S: int, form: str = "cols2"):
    """Scan kernel with in-step boundary selection: instead of writing the
    full (72, W*T*L) prefix vector to HBM (302 MB/window at n=2^20 — the
    dominant HBM cost) and gathering B-1 boundaries from it afterwards, the
    host tells each step which lanes hold bucket-boundary prefixes
    (sel (W*T, 1, S) i32 lane ids, -1 = empty slot) and the kernel emits
    only those, via an exact one-hot MXU dot of the step's fresh prefix.
    The B-1 boundary prefixes are consumed as an unordered SUM downstream
    (S_w = (B-1)*total - sum_t P[e_t]), so slot order never matters and
    duplicate lanes (empty buckets) are naturally counted with multiplicity.

    The mixed add here SKIPS the fused doubling path (~5.5 montmuls/step,
    ~35% of kernel time, for an astronomically-rare p == q case) and
    instead OR-accumulates a per-lane doubling flag; rows 72-79 of the
    totals output carry the flags home (ops.msm redoes the whole MSM on
    the doubling-safe full-prefix path if any flag fires — exactness is
    preserved, adversarial inputs can only cause a slowdown).

    records (49, 1, W*T*L) -> (bsel (72, 1, W*T*S), totals (80, 1, W*L))."""

    def kernel(const_ref, *rest):
        if form == "mxu":
            mxu_refs = rest[:2]
            rest = rest[2:]
        else:
            mxu_refs = ()
        rec_ref, sel_ref, bsel_ref, tot_ref, accx, accy, accz, accf = rest
        t = pl.program_id(1)
        rec = rec_ref[...]
        x = rec[:24, 0, :]
        y = rec[24:48, 0, :]
        infv = rec[48, 0, :] != 0
        with ma.force_unroll(), ma.mulform_override(form), ma.const_override(
            fq_mod=const_ref[:, 0],
            fq_one_mont=const_ref[:, 1],
            **_mxu_override(form, mxu_refs),
        ):
            first = t == 0
            zeros = jnp.zeros_like(x)
            prev = og.JPoints(
                jnp.where(first, zeros, accx[...]),
                jnp.where(first, zeros, accy[...]),
                jnp.where(first, zeros, accz[...]),
            )
            res, dbl = og._jmadd_formulas_flagged(prev, og.APoints(x, y, infv))
        accx[...] = res.x
        accy[...] = res.y
        accz[...] = res.z
        flag = jnp.broadcast_to(
            dbl.astype(jnp.uint32).reshape(1, L), (8, L)
        )
        accf[...] = jnp.where(t == 0, flag, accf[...] | flag)
        out = jnp.concatenate([res.x, res.y, res.z], axis=0)  # (72, L)
        tot_ref[...] = jnp.concatenate([out, accf[...]], axis=0).reshape(
            80, 1, L
        )
        # exact one-hot selection of boundary lanes (see ops.gather for the
        # byte-plane bf16 trick): prefix values are 16-bit limbs in u32
        # containers, so TWO byte planes suffice —
        # planes (144, L) @ one-hot (L, S) -> (144, S)
        planes = [
            (out & jnp.uint32(0xFF)),
            ((out >> jnp.uint32(8)) & jnp.uint32(0xFF)),
        ]
        a = (
            jnp.concatenate(planes, axis=0)
            .astype(jnp.int32)
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )
        lanes = jax.lax.broadcasted_iota(jnp.int32, (L, S), 0)
        oh = (
            (lanes == sel_ref[...].reshape(1, S))
            .astype(jnp.int32)
            .astype(jnp.float32)
            .astype(jnp.bfloat16)
        )
        acc = jnp.dot(a, oh, preferred_element_type=jnp.float32)
        p = acc.astype(jnp.int32).astype(jnp.uint32).reshape(2, 72, S)
        bsel_ref[...] = (p[0] | (p[1] << jnp.uint32(8))).reshape(72, 1, S)

    mxu_specs, mxu_args = _mxu_specs_args(form)

    def call(records, sel):
        return pl.pallas_call(
            kernel,
            grid=(W, T),
            in_specs=[_const_spec2()]
            + mxu_specs
            + [
                _vspec((49, 1, L), lambda w, t: (0, 0, w * T + t)),
                _vspec((1, 1, S), lambda w, t: (w * T + t, 0, 0)),
            ],
            out_specs=[
                _vspec((72, 1, S), lambda w, t: (0, 0, w * T + t)),
                _vspec((80, 1, L), lambda w, t: (0, 0, w)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((72, 1, W * T * S), jnp.uint32),
                jax.ShapeDtypeStruct((80, 1, W * L), jnp.uint32),
            ],
            scratch_shapes=(
                [pltpu.VMEM((24, L), jnp.uint32)] * 3
                + [pltpu.VMEM((8, L), jnp.uint32)]
                if pltpu is not None
                else []
            ),
            interpret=_interpret(),
        )(_consts_arr(), *mxu_args, records, sel)

    return call


import os as _os

_LANES = int(_os.environ.get("CURDLEPROOFS_SCAN_LANES", "0"))


def pick_lanes(n: int) -> int:
    """Scan lane width: the per-step parallelism of the sequential scan.

    Wider L = fewer, fatter sequential steps at the cost of more lane-offset
    stitch work (2*log2(L)*L adds/window, run at full width). Measured on
    v5e (benchmarks/micro_scan_lanes.py, n=2^16, 22 windows): L=256 136 ms,
    L=512 138 ms, L=1024 159 ms — throughput is flat ~10.5M mixed adds/s
    (near the fused-add roofline), while L=2048 exceeds the 16 MB scoped
    VMEM stack limit in the unrolled mixed-add kernel. 512 keeps the
    in-kernel boundary-selection occupancy ((B-1)/T) comfortably under
    SEL_SLOTS at every operating point. Overridable via
    CURDLEPROOFS_SCAN_LANES for tuning."""
    if _LANES:
        return min(_LANES, n)
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
    pref, tot = _build_scan(W, T, L, SCAN_MULFORM)(
        records.reshape(49, 1, W * T * L)
    )
    return pref.reshape(72, W, T * L), tot.reshape(72, W, L)


def scan_records_sel(
    records: jnp.ndarray, sel: jnp.ndarray, W: int, T: int, L: int, S: int
):
    """Streaming scan emitting only host-selected boundary prefixes.

    records (49, W*T*L) u32 as in scan_records; sel (W*T, S) i32 lane ids
    (-1 = empty slot, emits the zero triple = identity). Returns
    (bsel (72, W, T*S) selected prefixes, lane_totals (72, W, L),
    dbl_flags (W,) u32 — nonzero where the no-doubling fast-path madd hit
    the p == q case and the window result is INVALID; the caller must
    redo on the doubling-safe path)."""
    from curdleproofs_tpu.ops import pallas_g1

    if pallas_g1.enabled():
        bs, tot = _build_scan_sel(W, T, L, S, SCAN_MULFORM)(
            records.reshape(49, 1, W * T * L), sel.reshape(W * T, 1, S)
        )
        tot = tot.reshape(80, W, L)
        flags = jnp.max(tot[72], axis=-1)  # (W,) OR over lanes (0/1 values)
        return bs.reshape(72, W, T * S), tot[:72], flags
    pref, tot, flags = _scan_records_xla_flagged(records, W, T, L)
    # XLA twin: select from the full prefix. flat pos = t*L + lane
    lane = sel.reshape(W, T, S)
    pos = jnp.arange(T, dtype=jnp.int32).reshape(1, T, 1) * L + lane
    pos = jnp.where(lane >= 0, pos, -1).reshape(W, T * S)
    safe = jnp.clip(pos, 0, T * L - 1)
    bs = jnp.take_along_axis(pref, safe[None, :, :], axis=-1)
    bs = jnp.where((pos >= 0)[None, :, :], bs, jnp.zeros_like(bs))
    return bs, tot, flags


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


def _scan_records_xla_flagged(records: jnp.ndarray, W: int, T: int, L: int):
    """Exact lax.scan twin of the flagged sel kernel: no-doubling madd plus
    per-window doubling flags (same semantics as _build_scan_sel)."""
    rec = records.reshape(49, W, T, L)
    x, y, infv = rec[:24], rec[24:48], rec[48] != 0

    def step(carry, t):
        acc, f = carry
        q = og.APoints(x[:, :, t], y[:, :, t], infv[:, t])
        res, dbl = og._jmadd_formulas_flagged(acc, q)
        return (res, f | dbl.astype(jnp.uint32)), res

    (acc_t, fl), ys = jax.lax.scan(
        step,
        (og.jinf((W, L)), jnp.zeros((W, L), jnp.uint32)),
        jnp.arange(T),
    )

    def re(a):  # (T, 24, W, L) -> (24, W, T*L)
        return jnp.moveaxis(a, 0, 2).reshape(24, W, T * L)

    pref = jnp.concatenate([re(ys.x), re(ys.y), re(ys.z)], axis=0)
    tot = jnp.concatenate([acc_t.x, acc_t.y, acc_t.z], axis=0)
    return pref, tot, jnp.max(fl, axis=-1)
