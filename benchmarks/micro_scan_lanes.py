#!/usr/bin/env python
"""Sweep the streaming-scan lane width L at the MSM operating point.

The scan is a sequential chain of T = n/L mixed adds per window, each step
L lanes wide; wider L trades step count for per-step width. Times
scan_records alone on real point records (result checked via lane totals).

Env: N (65536), WB (window chunk, default 22), LANES (csv, default
512,1024,2048,4096), REPS (3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(os.environ.get("N", 1 << 16))
    wb = int(os.environ.get("WB", 22))
    reps = int(os.environ.get("REPS", 3))
    lanes = [int(x) for x in os.environ.get("LANES", "512,1024,2048,4096").split(",")]

    from curdleproofs_tpu.curve import G1
    from curdleproofs_tpu.fields import Fr
    from curdleproofs_tpu.ops import g1 as og
    from curdleproofs_tpu.ops import stream_scan as ostream

    rng = np.random.default_rng(0)
    base = og.pack_points([G1() * Fr(i + 1) for i in range(256)])
    # tile the 256 distinct points to n lanes (records only need valid points)
    reps_tile = n // 256
    px = np.tile(np.asarray(base.x), (1, reps_tile))
    py = np.tile(np.asarray(base.y), (1, reps_tile))
    pinf = np.zeros(n, np.uint32)
    packed = np.concatenate([px, py, pinf[None]], axis=0)  # (49, n)
    rec = np.broadcast_to(packed[:, None, :], (49, wb, n)).reshape(49, wb * n)
    recj = jnp.asarray(rec)
    print(f"n={n} wb={wb} backend={jax.default_backend()}")

    ref = None
    for L in lanes:
        T = n // L

        @jax.jit
        def run(r):
            pref, tot = ostream.scan_records(r, wb, T, L)
            # fold prefix to force it; return totals for cross-L check
            return jnp.bitwise_xor.reduce(pref, axis=None), tot

        t0 = time.perf_counter()
        fold, tot = run(recj)
        np.asarray(fold)
        tot0 = np.asarray(tot)  # (72, wb, L)
        print(f"L={L}: compile+run {time.perf_counter() - t0:.1f}s")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(recj)[0])
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        # window total (sum over lanes) must agree across L: compare the
        # final lane-scan on host via XOR of totals is NOT invariant; instead
        # check the full-window total by reducing lane totals with jadd chain
        from curdleproofs_tpu.ops import scan as oscan
        from curdleproofs_tpu.ops.g1 import JPoints

        tj = jnp.asarray(tot0)
        tr = oscan.tree_reduce_hybrid(JPoints(tj[:24], tj[24:48], tj[48:]))
        wt = og.jpoints_to_host(tr)[0]
        if ref is None:
            ref = wt
        assert wt == ref, f"L={L}: window total mismatch"
        adds = wb * n
        print(
            f"L={L}: {t * 1e3:.0f} ms  ({adds / t / 1e6:.1f}M mixed adds/s, "
            f"T={T} steps, {t / (wb * T) * 1e6:.0f} us/step)"
        )


if __name__ == "__main__":
    main()
