#!/usr/bin/env python
"""Measure whether host->device transfers overlap device compute on this
backend (the axon tunnel serializes transfers with compute per round-3
measurements -- re-validate before building a double-buffered pipeline).

Cases:
  put        : device_put X MB, block            -> per-transfer cost
  compute    : dispatch ~200ms kernel, block     -> pure compute
  overlap    : dispatch kernel, then device_put, block both
               (== compute  -> transfers overlap; == sum -> serialized)
  thread_put : device_put from a background thread mid-compute
  d2h_mid    : dispatch kernel, read back a small SEPARATE array mid-flight
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    mb = float(os.environ.get("MB", 2.4))
    iters = int(os.environ.get("ITERS", 800))
    nbytes = int(mb * 1e6)
    buf = np.random.randint(0, 1 << 15, size=nbytes // 2, dtype=np.int16)

    x0 = jnp.arange(1 << 20, dtype=jnp.uint32)
    small = jnp.arange(256, dtype=jnp.uint32)

    @jax.jit
    def burn(x):
        def body(i, x):
            return (x * jnp.uint32(2654435761) + jnp.uint32(12345)) ^ (x >> 7)

        return jax.lax.fori_loop(0, iters, body, x)

    t0 = time.perf_counter()
    np.asarray(burn(x0)[:8])
    print(f"burn compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    np.asarray(small)  # small array resident

    def t_put():
        t0 = time.perf_counter()
        d = jax.device_put(buf)
        d.block_until_ready()
        return time.perf_counter() - t0

    def t_compute():
        t0 = time.perf_counter()
        np.asarray(burn(x0)[:8])
        return time.perf_counter() - t0

    def t_overlap():
        t0 = time.perf_counter()
        r = burn(x0)  # async dispatch
        d = jax.device_put(buf)
        d.block_until_ready()
        tput = time.perf_counter() - t0
        np.asarray(r[:8])
        return time.perf_counter() - t0, tput

    def t_thread_put():
        res = {}

        def putter():
            tp0 = time.perf_counter()
            d = jax.device_put(buf)
            d.block_until_ready()
            res["put"] = time.perf_counter() - tp0

        t0 = time.perf_counter()
        r = burn(x0)
        th = threading.Thread(target=putter)
        th.start()
        th.join()
        np.asarray(r[:8])
        res["total"] = time.perf_counter() - t0
        return res

    def t_d2h_mid():
        t0 = time.perf_counter()
        r = burn(x0)
        v = np.asarray(small)  # tiny D2H while kernel in flight
        tmid = time.perf_counter() - t0
        np.asarray(r[:8])
        return time.perf_counter() - t0, tmid

    for name, fn in [("put", t_put), ("compute", t_compute)]:
        ts = [fn() for _ in range(4)]
        print(f"{name:10s}: {['%.3f' % t for t in ts]}", flush=True)
    for _ in range(4):
        tot, tput = t_overlap()
        print(f"overlap   : total {tot:.3f}  put-done-at {tput:.3f}", flush=True)
    for _ in range(3):
        r = t_thread_put()
        print(
            f"thread_put: total {r['total']:.3f}  put-inside {r['put']:.3f}",
            flush=True,
        )
    for _ in range(3):
        tot, tmid = t_d2h_mid()
        print(f"d2h_mid   : total {tot:.3f}  small-d2h-at {tmid:.3f}", flush=True)


if __name__ == "__main__":
    main()
