#!/usr/bin/env python
"""Phase breakdown of the host-sorted Pippenger MSM at BENCH_N (default 2^16).

Times each device phase in its own jit with K in-jit iterations (the axon
tunnel costs ~20-40ms per dispatch): sorted-order gather, prefix scan,
boundary gather, boundary tree-reduce."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _touch(r):
    """Force execution by materializing ONE element per output (the axon
    tunnel returns early from block_until_ready; transferring the full array
    would instead measure tunnel bandwidth)."""
    jax.tree_util.tree_map(
        lambda a: np.asarray(a[(slice(0, 1),) * a.ndim]), r
    )


def bench(fn, args, reps=2):
    _touch(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _touch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from curdleproofs_tpu.ops import g1 as og
    from curdleproofs_tpu.ops import gather as ogather
    from curdleproofs_tpu.ops import msm as omsm
    from curdleproofs_tpu.ops import scan as oscan
    from curdleproofs_tpu.ops.g1 import APoints, JPoints

    n = int(os.environ.get("BENCH_N", 1 << 16))
    c = int(os.environ.get("BENCH_C", 12))
    W = -(-255 // c)
    B = 1 << c
    rng = np.random.default_rng(0)

    packed = jnp.asarray(
        rng.integers(0, 1 << 32, size=(49, n), dtype=np.uint64).astype(np.uint32)
    )
    order = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(W)]).astype(np.int32)
    )
    e = jnp.asarray(rng.integers(0, n, size=(W, B - 1), dtype=np.int64).astype(np.int32))
    out = {"n": n, "c": c, "W": W}

    t = bench(jax.jit(lambda p, o: ogather.gather_u32_shared(p, o)), (packed, order))
    out["gather_sorted_s"] = round(t, 3)

    # scan over the gathered layout (24, W, n) x3 coords
    coords = jnp.asarray(
        rng.integers(0, 1 << 32, size=(24, W, n), dtype=np.uint64).astype(np.uint32)
    )
    jp = JPoints(coords, coords, coords)
    t = bench(jax.jit(lambda p: oscan.inclusive_scan(p)), (jp,))
    out["scan_s"] = round(t, 3)

    btab = jnp.asarray(
        rng.integers(0, 1 << 32, size=(72, W, n), dtype=np.uint64).astype(np.uint32)
    )
    t = bench(jax.jit(lambda b, ee: ogather.gather_u32(b, ee)), (btab, e))
    out["gather_boundary_s"] = round(t, 3)

    bnd = JPoints(coords[:, :, : B - 1], coords[:, :, : B - 1], coords[:, :, : B - 1])
    t = bench(jax.jit(lambda p: oscan.tree_reduce_hybrid(p)), (bnd,))
    out["tree_reduce_s"] = round(t, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
