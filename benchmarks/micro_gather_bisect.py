#!/usr/bin/env python
"""Bisect the rowwise-gather kernel's time: full kernel vs dot-only
(constant one-hot: MXU upper bound) vs onehot-only (VPU cost) vs
no-recombine. Shapes = routed stage 2 at n=2^17."""
import functools, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _vspec(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

@functools.lru_cache(maxsize=None)
def build(R, G, K, M, GB, BM, form):
    P = 2
    def kernel(tab_ref, idx_ref, out_ref):
        for g in range(GB):
            t = tab_ref[g]
            ps = [(t >> jnp.uint32(8 * i)) & jnp.uint32(0xFF) for i in range(P)]
            cat = jnp.concatenate(ps, axis=0)
            a = cat.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            rows = lax.broadcasted_iota(jnp.int32, (K, BM), 0)
            if form == "dotonly":
                oh = (rows == 7).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            else:
                hit = rows == idx_ref[g].reshape(1, BM)
                oh = hit.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            if form == "ohonly":
                acc = jnp.zeros((P * R, BM), jnp.float32) + oh[0] + a[:, :1]
            else:
                acc = jnp.dot(a, oh, preferred_element_type=jnp.float32)
            if form == "norecomb":
                out_ref[g] = acc.astype(jnp.uint32)[:R]
            else:
                p = acc.astype(jnp.int32).astype(jnp.uint32).reshape(P, R, BM)
                out_ref[g] = p[0] | (p[1] << jnp.uint32(8))
    grid = (G // GB, M // BM)
    def call(table, idx):
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[_vspec((GB, R, K), lambda g, j: (g, 0, 0)),
                      _vspec((GB, 1, BM), lambda g, j: (g, 0, j))],
            out_specs=_vspec((GB, R, BM), lambda g, j: (g, 0, j)),
            out_shape=jax.ShapeDtypeStruct((G, R, M), jnp.uint32),
            interpret=jax.default_backend() != "tpu",
        )(table, idx[:, None, :])
    return call

def main():
    R = int(os.environ.get("R", 49))
    G, K = int(os.environ.get("G", 1024)), int(os.environ.get("K", 512))
    M = K
    rng = np.random.default_rng(0)
    tab = rng.integers(0, 1 << 16, (G, R, K), dtype=np.uint32)
    idx = np.stack([rng.permutation(K) for _ in range(G)]).astype(np.int32)
    tj, ij = jnp.asarray(tab), jnp.asarray(idx)
    BM = M
    for form in ("full", "dotonly", "ohonly", "norecomb"):
        for GB in (int(os.environ.get("GB", 0)),) if os.environ.get("GB") else (8, 16, 32):
            while G % GB: GB -= 1
            fn = build(R, G, K, M, GB, BM, form)
            fold = jax.jit(lambda t, i, f=fn: jnp.bitwise_xor.reduce(f(t, i), axis=None))
            try:
                np.asarray(fold(tj, ij))
            except Exception as e:
                print(f"{form} GB={GB}: FAILED {str(e)[:120]}"); continue
            ts = []
            for _ in range(4):
                t0 = time.perf_counter(); np.asarray(fold(tj, ij)); ts.append(time.perf_counter() - t0)
            print(f"{form:9s} GB={GB:3d}: {min(ts)*1e3:6.1f} ms", flush=True)

if __name__ == "__main__":
    main()
