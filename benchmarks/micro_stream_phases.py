#!/usr/bin/env python
"""Phase breakdown of msm_pippenger_stream at the operating point.

Times each host-prep stage and the device dispatch/materialize separately,
so optimization goes where the wall-clock actually is.

Env: BENCH_N (65536), BENCH_C (pick_window), REPS (2)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import hashlib

    import jax.numpy as jnp
    import numpy as np

    from curdleproofs_tpu.curve import G1
    from curdleproofs_tpu.fields import FR_MOD, Fr
    from curdleproofs_tpu.ops import g1 as og
    from curdleproofs_tpu.ops import msm as omsm
    from curdleproofs_tpu.ops import route as oroute
    from curdleproofs_tpu.ops.fieldspec import ints_to_limbs
    from curdleproofs_tpu.ops.stream_scan import pick_lanes

    n = int(os.environ.get("BENCH_N", 1 << 16))
    reps = int(os.environ.get("REPS", 2))

    pts, acc, g7 = [], G1(), G1() * Fr(7)
    for _ in range(n):
        pts.append(acc)
        acc = acc + g7
    scs = [
        Fr(int.from_bytes(hashlib.sha256(f"b{i}".encode()).digest(), "little") % FR_MOD)
        for i in range(n)
    ]
    points = og.pack_points(pts)
    sc_np = np.asarray(ints_to_limbs([s.v for s in scs], 16), dtype=np.uint32)

    c = int(os.environ.get("BENCH_C", omsm.pick_window(n)))
    W = -(-255 // c)
    L = pick_lanes(n)
    T = n // L
    S = omsm.SEL_SLOTS
    print(f"n={n} c={c} W={W} L={L} T={T} S={S}")

    # full-call reference timing (includes everything)
    r0 = omsm.msm_pippenger_stream(points, sc_np, c=c)  # compile warmup
    for _ in range(reps):
        t0 = time.perf_counter()
        omsm.msm_pippenger_stream(points, sc_np, c=c)
        print(f"full msm_pippenger_stream: {time.perf_counter() - t0:.3f}s")

    # --- host phases -------------------------------------------------------
    t0 = time.perf_counter()
    digits = omsm.host_digits(sc_np, c)
    t_dig = time.perf_counter() - t0
    t0 = time.perf_counter()
    order_cm, bidx, lidx, e = omsm.stream_host_prep(digits, c, L)
    t_prep = time.perf_counter() - t0
    t0 = time.perf_counter()
    sel, bpos = omsm._build_sel(e, T, S)
    t_sel = time.perf_counter() - t0
    assert sel is not None, "sel overflow at operating point"
    rr, rc = oroute.pick_rc(n, omsm.ROUTE_MIN_FACTOR)
    t0 = time.perf_counter()
    i1, i2, i3 = oroute.decompose(rr, rc, order_cm)
    t_route = time.perf_counter() - t0
    print(
        f"host: digits {t_dig*1e3:.0f}ms, argsort+prep {t_prep*1e3:.0f}ms, "
        f"build_sel {t_sel*1e3:.0f}ms, route-solve(all {W}w, 1 thread) "
        f"{t_route*1e3:.0f}ms"
    )

    # --- device phases (routed gather+scan+stitch in one dispatch) ---------
    packed = jnp.concatenate(
        [points.x, points.y, points.inf[None].astype(jnp.uint32)], axis=0
    )
    wb = 8
    i1c = jnp.asarray(i1[:wb].astype(np.int16))
    i2c = jnp.asarray(i2[:wb].astype(np.int16))
    i3c = jnp.asarray(i3[:wb].astype(np.int16))
    selc = jnp.asarray(sel[: wb * T])
    bpc = jnp.asarray(bpos[:wb])
    lc = jnp.asarray(lidx[:wb])
    f = omsm._stream_window_partials_routed_sel
    tot, bs = f(packed, i1c, i2c, i3c, selc, bpc, lc, T, L, S)  # warm
    np.asarray(tot.x)
    for _ in range(reps):
        t0 = time.perf_counter()
        tot, bs = f(packed, i1c, i2c, i3c, selc, bpc, lc, T, L, S)
        np.asarray(bs.x)
        np.asarray(tot.x)
        dt = time.perf_counter() - t0
        print(
            f"device chunk wb={wb}: {dt*1e3:.0f}ms "
            f"(x{-(-W // wb)} chunks = {dt * (-(-W // wb)) * 1e3:.0f}ms)"
        )

    # transfer cost of the index tables alone
    t0 = time.perf_counter()
    for a in (i1[:wb].astype(np.int16), i2[:wb].astype(np.int16), i3[:wb].astype(np.int16)):
        np.asarray(jnp.asarray(a))
    print(f"index-table transfer wb={wb}: {(time.perf_counter()-t0)*1e3:.0f}ms")


if __name__ == "__main__":
    main()
