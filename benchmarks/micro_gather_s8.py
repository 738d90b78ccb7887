#!/usr/bin/env python
"""int8-MXU one-hot gather experiment vs the bf16 byte-plane kernel.

v5e multiplies int8 at ~2x the bf16 MAC rate. Bytes (0..255) don't fit
s8, but with exactly ONE one-hot hit per output column the offset trick
is exact:  sum (b_i - 128) * oh_i = out - 128  ->  out = dot + 128.

Measures the rowwise gather shape of the MSM's routed stage 2 (the MAC-
dominant stage): G groups, K contraction, M outputs per group.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:
    pltpu = None
    _VMEM = None


def _vspec(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=_VMEM)


@functools.lru_cache(maxsize=None)
def build_s8(R, G, K, M, GB, BM):
    def kernel(tab_ref, idx_ref, out_ref):
        for g in range(GB):
            t = tab_ref[g]  # (R, K) u32
            planes = [
                (t & jnp.uint32(0xFF)),
                ((t >> jnp.uint32(8)) & jnp.uint32(0xFF)),
                ((t >> jnp.uint32(16)) & jnp.uint32(0xFF)),
                ((t >> jnp.uint32(24)) & jnp.uint32(0xFF)),
            ]
            a = (
                (jnp.concatenate(planes, axis=0).astype(jnp.int32) - 128)
                .astype(jnp.int8)
            )  # (4R, K) in [-128, 127]
            rows = lax.broadcasted_iota(jnp.int32, (K, BM), 0)
            oh = (
                jnp.where(rows == idx_ref[g].reshape(1, BM), 1, 0)
                .astype(jnp.int8)
            )
            acc = jnp.dot(a, oh, preferred_element_type=jnp.int32)
            p = (acc + 128).astype(jnp.uint32).reshape(4, R, BM)
            out_ref[g] = (
                p[0] | (p[1] << jnp.uint32(8)) | (p[2] << jnp.uint32(16))
                | (p[3] << jnp.uint32(24))
            )

    grid = (G // GB, M // BM)

    def call(table, idx):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                _vspec((GB, R, K), lambda g, j: (g, 0, 0)),
                _vspec((GB, 1, BM), lambda g, j: (g, 0, j)),
            ],
            out_specs=_vspec((GB, R, BM), lambda g, j: (g, 0, j)),
            out_shape=jax.ShapeDtypeStruct((G, R, M), jnp.uint32),
            interpret=jax.default_backend() != "tpu",
        )(table, idx)

    return call


def main():
    from curdleproofs_tpu.ops import gather as ogather

    R = 49
    G = int(os.environ.get("G", 2560))  # W*c at 2^16: 10*256
    K = int(os.environ.get("K", 512))  # r
    M = K  # stage-2 shape: M = r per group
    reps = int(os.environ.get("REPS", 3))
    rng = np.random.default_rng(0)
    tab = rng.integers(0, 1 << 32, (G, R, K), dtype=np.uint32)
    idx = rng.integers(0, K, (G, M)).astype(np.int32)
    tj, ij = jnp.asarray(tab), jnp.asarray(idx)
    macs = 4 * R * G * K * M
    print(f"G={G} K={K} M={M}  MACs {macs / 1e9:.1f}G", flush=True)

    # same blocking policy as ops.gather.rowwise_gather
    BM = M if M <= 2048 else 2048
    while M % BM:
        BM -= 128 if BM > 128 else 1
    GB = max(1, min(G, (6 << 20) // (R * (K + BM) * 4)))
    while G % GB:
        GB -= 1
    print(f"GB={GB} BM={BM}", flush=True)

    def run(fn, name):
        fold = jax.jit(lambda t, i: jnp.bitwise_xor.reduce(fn(t, i), axis=None))
        t0 = time.perf_counter()
        try:
            v = np.asarray(fold(tj, ij))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            return None
        print(f"{name}: compile+run {time.perf_counter() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fold(tj, ij))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{name}: {t * 1e3:.1f} ms  ({macs / t / 1e12:.1f} T-MAC/s)", flush=True)
        return np.asarray(fn(tj, ij))

    out_bf = run(ogather.rowwise_gather, "bf16")
    out_s8 = run(build_s8(R, G, K, M, GB, BM), "s8  ")
    if out_bf is not None and out_s8 is not None:
        assert np.array_equal(out_bf, out_s8), "s8 gather WRONG"
        print("s8 == bf16 (exact)")


if __name__ == "__main__":
    main()
