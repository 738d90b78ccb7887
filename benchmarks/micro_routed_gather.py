#!/usr/bin/env python
"""Routed (3-stage Beneš/Hall) vs direct one-hot permutation gather on TPU.

The sorted-order gather feeding the streaming Pippenger MSM costs
4R*n*n MACs/window direct vs 4R*n*(2c+r) routed. Measures both at the MSM
operating point (R=49 point-record rows) plus the host routing solve.

Env: N (default 65536), W (default 22), REPS (default 3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from curdleproofs_tpu.ops import gather as og
from curdleproofs_tpu.ops import route


def main():
    n = int(os.environ.get("N", 1 << 16))
    W = int(os.environ.get("W", 22))
    reps = int(os.environ.get("REPS", 3))
    R = 49
    rng = np.random.default_rng(0)
    packed = rng.integers(0, 1 << 32, (R, n), dtype=np.uint32)
    src = np.stack([rng.permutation(n) for _ in range(W)]).astype(np.int32)
    exp = np.stack([packed[:, src[w]] for w in range(W)], axis=1)

    r, c = route.pick_rc(n)
    print(f"n={n} W={W} R={R} rc=({r},{c}) backend={jax.default_backend()}")

    t0 = time.perf_counter()
    i1, i2, i3 = route.decompose(r, c, src)
    t_solve = time.perf_counter() - t0
    print(f"host routing solve: {t_solve:.3f}s ({1e3 * t_solve / W:.1f} ms/window)")

    pj = jnp.asarray(packed)
    i1j, i2j, i3j = jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(i3)
    routed = jax.jit(og.routed_gather)
    # timing must force execution but not a 283MB tunnel transfer: fold the
    # output to one u32 on device and transfer that
    fold = jax.jit(lambda *a: jnp.bitwise_xor.reduce(routed(*a), axis=None))

    t0 = time.perf_counter()
    out = np.asarray(routed(pj, i1j, i2j, i3j))
    print(f"routed compile+run+fullxfer: {time.perf_counter() - t0:.2f}s")
    assert np.array_equal(out, exp), "routed gather WRONG"
    np.asarray(fold(pj, i1j, i2j, i3j))  # warm the folded graph
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fold(pj, i1j, i2j, i3j))
        ts.append(time.perf_counter() - t0)
    t_routed = min(ts)
    macs = 4 * R * n * (2 * c + r) * W
    print(f"routed: {t_routed * 1e3:.1f} ms  ({macs / t_routed / 1e12:.1f} T-MAC/s)")

    if os.environ.get("SKIP_DIRECT"):
        return
    srcj = jnp.asarray(src)
    direct = jax.jit(og.gather_u32_shared)
    dfold = jax.jit(lambda *a: jnp.bitwise_xor.reduce(direct(*a), axis=None))
    t0 = time.perf_counter()
    out = np.asarray(direct(pj, srcj))
    print(f"direct compile+run+fullxfer: {time.perf_counter() - t0:.2f}s")
    assert np.array_equal(out, exp), "direct gather WRONG"
    np.asarray(dfold(pj, srcj))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(dfold(pj, srcj))
        ts.append(time.perf_counter() - t0)
    t_direct = min(ts)
    macs = 4 * R * n * n * W
    print(f"direct: {t_direct * 1e3:.1f} ms  ({macs / t_direct / 1e12:.1f} T-MAC/s)")
    print(f"speedup (device only): {t_direct / t_routed:.1f}x; "
          f"incl. solve: {t_direct / (t_routed + t_solve):.1f}x")


if __name__ == "__main__":
    main()
