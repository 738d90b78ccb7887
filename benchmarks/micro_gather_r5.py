#!/usr/bin/env python
"""Round-5 rowwise-gather kernel shootout at the routed-gather's production
shapes (stage 2 of the 3-stage route at n = 2^17: G = W*c groups,
K = r = 512 contraction, M = r outputs per group).

Variants:
  bf16-4p : production kernel, 4 byte planes (round-4 baseline)
  bf16-2p : production kernel, 2 byte planes (16-bit limb tables)
  s8-2p   : int8 MXU dot, 2 planes, offset-128 trick + hit row
  bf16-2p-w : 2 planes, one-hot built via where(bf16) (fewer casts)

Reports ms and effective T-MAC/s (normalized to the 4-plane MAC count so
variants are comparable: fewer planes = fewer MACs = higher ratio).
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
def build(R, G, K, M, GB, BM, form):
    P = 2 if form != "bf16-4p" else 4

    def kernel(tab_ref, idx_ref, out_ref):
        for g in range(GB):
            t = tab_ref[g]  # (R, K)
            ps = [
                (t >> jnp.uint32(8 * i)) & jnp.uint32(0xFF) for i in range(P)
            ]
            cat = jnp.concatenate(ps, axis=0)
            rows = lax.broadcasted_iota(jnp.int32, (K, BM), 0)
            hit = rows == idx_ref[g].reshape(1, BM)
            if form == "s8-2p":
                a = (cat.astype(jnp.int32) - 128).astype(jnp.int8)
                oh = jnp.where(hit, 1, 0).astype(jnp.int8)
                acc = jnp.dot(a, oh, preferred_element_type=jnp.int32)
                # hit-count row: reconstruct +128*hits (idx always in range
                # here, so hits == 1; keep general via a ones row)
                p = (acc + 128).astype(jnp.uint32).reshape(P, R, BM)
            elif form == "bf16-2p-w":
                a = (
                    cat.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
                )
                oh = jnp.where(hit, jnp.bfloat16(1), jnp.bfloat16(0))
                acc = jnp.dot(a, oh, preferred_element_type=jnp.float32)
                p = acc.astype(jnp.int32).astype(jnp.uint32).reshape(P, R, BM)
            else:
                a = (
                    cat.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
                )
                oh = (
                    hit.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
                )
                acc = jnp.dot(a, oh, preferred_element_type=jnp.float32)
                p = acc.astype(jnp.int32).astype(jnp.uint32).reshape(P, R, BM)
            out = p[0]
            for i in range(1, P):
                out = out | (p[i] << jnp.uint32(8 * i))
            out_ref[g] = out

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
        )(table, idx[:, None, :])

    return call


def main():
    R = 49
    G = int(os.environ.get("G", 1024))  # W*c at 2^17 GLV: 4*256
    K = int(os.environ.get("K", 512))  # r
    M = K
    reps = int(os.environ.get("REPS", 5))
    rng = np.random.default_rng(0)
    tab = rng.integers(0, 1 << 16, (G, R, K), dtype=np.uint32)  # 16-bit limbs
    idx = np.stack([rng.permutation(K) for _ in range(G)]).astype(np.int32)
    tj, ij = jnp.asarray(tab), jnp.asarray(idx)
    macs4 = 4 * R * G * K * M
    print(f"G={G} K={K} M={M}  4-plane MACs {macs4 / 1e9:.1f}G", flush=True)

    BM = M if M <= 2048 else 2048
    while M % BM:
        BM -= 128 if BM > 128 else 1
    want = None
    for form in ("bf16-4p", "bf16-2p", "bf16-2p-w", "s8-2p"):
        P = 2 if form != "bf16-4p" else 4
        GB = max(1, min(G, int(os.environ.get("VMEM_MB", "6")) * (1 << 20)
                        // (R * (K + BM) * 4)))
        while G % GB:
            GB -= 1
        fn = build(R, G, K, M, GB, BM, form)
        fold = jax.jit(lambda t, i, f=fn: jnp.bitwise_xor.reduce(f(t, i), axis=None))
        t0 = time.perf_counter()
        try:
            np.asarray(fold(tj, ij))
        except Exception as e:
            print(f"{form}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        print(f"{form}: GB={GB} compile+run {time.perf_counter() - t0:.1f}s", flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fold(tj, ij))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        out = np.asarray(fn(tj, ij))
        if want is None:
            want = np.stack([tab[g][:, idx[g]] for g in range(G)])
        ok = np.array_equal(out, want)
        print(
            f"{form}: {t * 1e3:6.1f} ms  ({macs4 / t / 1e12:5.1f} T-MAC/s eff)"
            f"  exact={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
