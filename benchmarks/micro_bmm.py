#!/usr/bin/env python
"""Raw batched-matmul + XLA one-hot gather at routed-gather shapes.
np.asarray of a scalar fold forces real execution (block_until_ready
returns early on the axon tunnel)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def bench(f, args, reps=4, name=""):
    np.asarray(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(f(*args)); ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:7.1f} ms", flush=True)

G, R2, K, M = 1024, 98, 512, 512
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 256, (G, R2, K)).astype(np.float32).astype(jnp.bfloat16))
b = jnp.asarray(rng.integers(0, 2, (G, K, M)).astype(np.float32).astype(jnp.bfloat16))
macs = G * R2 * K * M
print(f"{macs / 1e9:.1f}G MACs", flush=True)

@jax.jit
def bmm(a, b):
    r = jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    return jnp.sum(r)
bench(bmm, (a, b), name="bmm bf16 fold")

tab = jnp.asarray(rng.integers(0, 1 << 16, (G, 49, K), dtype=np.uint32))
idx = jnp.asarray(np.stack([rng.permutation(K) for _ in range(G)]).astype(np.int32))

def gather_core(tab, idx):
    planes = [(tab & 0xFF), ((tab >> 8) & 0xFF)]
    aa = jnp.concatenate(planes, axis=1).astype(jnp.float32).astype(jnp.bfloat16)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (G, K, M), 1) == idx[:, None, :])
    ohb = oh.astype(jnp.float32).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(aa, ohb, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    p = acc.astype(jnp.int32).astype(jnp.uint32).reshape(G, 2, 49, M)
    return p[:, 0] | (p[:, 1] << jnp.uint32(8))

@jax.jit
def xg_fold(tab, idx):
    return jnp.bitwise_xor.reduce(gather_core(tab, idx), axis=None)
bench(xg_fold, (tab, idx), name="xla one-hot gather fold")

out = np.asarray(jax.jit(gather_core)(tab, idx))
want = np.stack([np.asarray(tab)[g][:, np.asarray(idx)[g]] for g in range(G)])
print("exact:", np.array_equal(out, want), flush=True)
