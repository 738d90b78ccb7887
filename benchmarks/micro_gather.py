#!/usr/bin/env python
"""Microbenchmarks for the Pippenger gather problem (ROADMAP item 1).

All experiments loop K iterations INSIDE one jitted function (the axon tunnel
costs ~20-40ms per dispatch, so eager per-op timing is meaningless). Reported
numbers are per-iteration.

  A. XLA argsort of (n,) digits
  B. XLA lane-gather on (24, n) coords by a permutation
  D. row-layout gather: (n, 128) u32 rows by a permutation
  E. bitonic compare-exchange stage (keys + 48-row payload), stride-1 reshape
  E2. same, cross-lane via roll
  F. fused Pallas jadd at width n
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench(jitted, args, iters, reps=3):
    jitted(*args)  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = jitted(*args)
        jax.tree_util.tree_map(
            lambda a: np.asarray(a).ravel()[:1] if hasattr(a, "shape") else a, r
        )
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters


def main():
    n = int(os.environ.get("MB_N", 1 << 16))
    K = int(os.environ.get("MB_K", 10))
    rng = np.random.default_rng(0)
    digits = jnp.asarray(rng.integers(0, 1 << 13, size=n, dtype=np.int32))
    coords = jnp.asarray(
        rng.integers(0, 1 << 32, size=(24, n), dtype=np.uint64).astype(np.uint32)
    )
    rows = jnp.asarray(
        rng.integers(0, 1 << 32, size=(n, 128), dtype=np.uint64).astype(np.uint32)
    )
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    out = {}

    def loopK(step):
        """step: carry -> carry; runs K times inside jit."""

        def f(*carry):
            return lax.fori_loop(0, K, lambda i, c: step(i, c), carry)

        return jax.jit(f)

    # A. argsort
    fA = loopK(lambda i, c: (jnp.argsort(c[0] + i), c[1]))
    out["A_argsort_s"] = bench(fA, (digits, digits), K)

    # B. lane gather (24, n)
    fB = loopK(lambda i, c: (c[0][:, c[1]], (c[1] + 1) % n))
    out["B_lane_gather_s"] = bench(fB, (coords, perm), K)

    # D. row gather (n, 128)
    fD = loopK(lambda i, c: (jnp.take(c[0], c[1], axis=0), (c[1] + 1) % n))
    out["D_row_gather_s"] = bench(fD, (rows, perm), K)

    # E. bitonic stage, stride-1 (reshape pairing)
    def stageE(i, c):
        keys, payload = c
        k2 = keys.reshape(-1, 2)
        swap = k2[:, 0] > k2[:, 1]
        lo = jnp.where(swap, k2[:, 1], k2[:, 0])
        hi = jnp.where(swap, k2[:, 0], k2[:, 1])
        p2 = payload.reshape(48, -1, 2)
        a = jnp.where(swap[None, :], p2[:, :, 1], p2[:, :, 0])
        b = jnp.where(swap[None, :], p2[:, :, 0], p2[:, :, 1])
        return (
            jnp.stack([lo, hi], axis=-1).reshape(-1),
            jnp.stack([a, b], axis=-1).reshape(48, -1),
        )

    payload = jnp.concatenate([coords, coords], axis=0)
    fE = loopK(stageE)
    out["E_bitonic_stage_s"] = bench(fE, (digits, payload), K)

    # E2. roll stage at stride 128
    def stageE2(i, c):
        keys, payload = c
        partner = jnp.roll(keys, -128)
        swap = keys > partner
        pp = jnp.roll(payload, -128, axis=-1)
        return jnp.where(swap, partner, keys), jnp.where(swap[None, :], pp, payload)

    fE2 = loopK(stageE2)
    out["E2_roll_stage_s"] = bench(fE2, (digits, payload), K)

    # F. fused Pallas jadd (already shape-stable; loop inside one jit)
    from curdleproofs_tpu.ops import pallas_g1 as pg
    from curdleproofs_tpu.ops.g1 import JPoints

    def stepF(i, c):
        p = JPoints(c[0], c[1], c[2])
        r = pg.jadd(p, p)
        return (r.x, r.y, r.z)

    fF = loopK(stepF)
    out["F_pallas_jadd_s"] = bench(fF, (coords, coords, coords), K, reps=2)

    # G. take_along_axis on (24, n) with per-row broadcast idx
    fG = loopK(
        lambda i, c: (
            jnp.take_along_axis(c[0], jnp.broadcast_to(c[1], (24, n)), axis=-1),
            (c[1] + 1) % n,
        )
    )
    out["G_take_along_axis_s"] = bench(fG, (coords, perm[None, :]), K)

    out["n"] = n
    out["K"] = K
    out["backend"] = jax.default_backend()
    print(
        json.dumps(
            {k: (round(v, 6) if isinstance(v, float) else v) for k, v in out.items()}
        )
    )


if __name__ == "__main__":
    main()
