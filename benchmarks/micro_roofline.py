#!/usr/bin/env python
"""Device roofline calibration: HBM copy bandwidth, VPU u32/f32 elementwise
throughput, i32 multiply rate, MXU matmul TOPS. Loops inside jit to amortize
the axon tunnel dispatch latency."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench(jitted, args, reps=3):
    jitted(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = jitted(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a).ravel()[:1], r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    K = 10
    out = {}

    # 1. HBM copy: 256 MB f32 roll (read+write)
    x = jnp.zeros((64, 1024, 1024), jnp.float32)
    f = jax.jit(lambda x: lax.fori_loop(0, K, lambda i, c: c + 1.0, x))
    t = bench(f, (x,))
    out["ew_f32_GBps"] = round(2 * x.nbytes * K / t / 1e9, 2)

    # 2. u32 elementwise add
    y = jnp.zeros((64, 1024, 1024), jnp.uint32)
    f = jax.jit(lambda y: lax.fori_loop(0, K, lambda i, c: c + jnp.uint32(1), y))
    t = bench(f, (y,))
    out["ew_u32_GBps"] = round(2 * y.nbytes * K / t / 1e9, 2)
    out["ew_u32_Gops"] = round(y.size * K / t / 1e9, 2)

    # 3. u32 multiply chain in VMEM-sized block (compute bound): 64 muls/elt
    z = jnp.ones((8, 512), jnp.uint32)

    def mulchain(c):
        for _ in range(64):
            c = c * jnp.uint32(2654435761) + jnp.uint32(1)
        return c

    f = jax.jit(lambda z: lax.fori_loop(0, 200, lambda i, c: mulchain(c), z))
    t = bench(f, (z,))
    out["u32_mul_Gops_small"] = round(z.size * 64 * 200 / t / 1e9, 2)

    # 3b. same at bigger width (HBM-resident)
    z2 = jnp.ones((1024, 16384), jnp.uint32)
    f = jax.jit(lambda z: lax.fori_loop(0, K, lambda i, c: mulchain(c), z2))
    t = bench(f, (z2,))
    out["u32_mul_Gops_big"] = round(z2.size * 64 * K / t / 1e9, 2)

    # 4. f32 matmul 2048^3 (MXU)
    a = jnp.ones((2048, 2048), jnp.float32)
    f = jax.jit(
        lambda a: lax.fori_loop(
            0, K, lambda i, c: jnp.dot(c, a, preferred_element_type=jnp.float32) * 0.5 , a
        )
    )
    t = bench(f, (a,))
    out["mxu_f32_TFLOPs"] = round(2 * (2048**3) * K / t / 1e12, 2)

    # 5. bf16 matmul
    ab = jnp.ones((2048, 2048), jnp.bfloat16)
    f = jax.jit(
        lambda a: lax.fori_loop(
            0,
            K,
            lambda i, c: (
                jnp.dot(c, c, preferred_element_type=jnp.float32) * 0.5
            ).astype(jnp.bfloat16),
            a,
        )
    )
    t = bench(f, (ab,))
    out["mxu_bf16_TFLOPs"] = round(2 * (2048**3) * K / t / 1e12, 2)

    # 6. int8 matmul -> int32
    ai = jnp.ones((2048, 2048), jnp.int8)
    f = jax.jit(
        lambda a: lax.fori_loop(
            0,
            K,
            lambda i, c: (
                jnp.dot(c, c, preferred_element_type=jnp.int32) & 127
            ).astype(jnp.int8),
            a,
        )
    )
    t = bench(f, (ai,))
    out["mxu_int8_TOPS"] = round(2 * (2048**3) * K / t / 1e12, 2)

    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
