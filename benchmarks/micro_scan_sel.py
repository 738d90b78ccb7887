#!/usr/bin/env python
"""Kernel-rate A/B: doubling-complete scan (scan_records) vs the flagged
no-doubling sel scan (scan_records_sel) at the MSM operating point.

Env: N (131072 = GLV-doubled 2^16), W (10), L (512), S (128), REPS (5).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(os.environ.get("N", 1 << 17))
    W = int(os.environ.get("W", 10))
    L = int(os.environ.get("L", 512))
    S = int(os.environ.get("S", 128))
    reps = int(os.environ.get("REPS", 5))
    T = n // L

    from curdleproofs_tpu.curve import G1, mul_host_batch
    from curdleproofs_tpu.fields import FR_MOD, Fr
    from curdleproofs_tpu.ops import g1 as og
    from curdleproofs_tpu.ops import stream_scan as ostream

    rng = np.random.default_rng(0)
    base = og.pack_points(
        mul_host_batch([G1()] * 512, [Fr(int(v)) for v in
                        rng.integers(1, 1 << 62, size=512)])
    )
    reps_tile = n // 512
    px = np.tile(np.asarray(base.x), (1, reps_tile))
    py = np.tile(np.asarray(base.y), (1, reps_tile))
    pinf = np.zeros(n, np.uint32)
    packed = np.concatenate([px, py, pinf[None]], axis=0)  # (49, n)
    rec = np.broadcast_to(packed[:, None, :], (49, W, n)).reshape(49, W * n)
    recj = jnp.asarray(rec)
    sel = np.full((W * T, S), -1, np.int32)
    sel[:, 0] = rng.integers(0, L, size=W * T)
    selj = jnp.asarray(sel)
    print(f"n={n} W={W} L={L} T={T} S={S} backend={jax.default_backend()}")

    @jax.jit
    def run_plain(r):
        pref, tot = ostream.scan_records(r, W, T, L)
        return jnp.bitwise_xor.reduce(tot, axis=None)

    @jax.jit
    def run_sel(r, s):
        bs, tot, fl = ostream.scan_records_sel(r, s, W, T, L, S)
        return jnp.bitwise_xor.reduce(tot, axis=None) ^ jnp.max(fl)

    for name, fn in (("plain", lambda: run_plain(recj)),
                     ("sel  ", lambda: run_sel(recj, selj))):
        t0 = time.perf_counter()
        np.asarray(fn())
        print(f"{name}: compile+run {time.perf_counter() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(
            f"{name}: median {med * 1e3:.1f} ms  "
            f"{W * n / med / 1e6:.1f}M mixed adds/s  "
            f"all {['%.3f' % t for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
