#!/usr/bin/env python
"""Compare MSM methods on the real chip at BENCH_N (default 2^16).

Reports wall time per MSM + compile time per method, so the headline bench
can pick the fastest engine. Timings force a host transfer (axon tunnel:
block_until_ready returns early)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import hashlib

    import numpy as np

    from curdleproofs_tpu.curve import G1, msm_host
    from curdleproofs_tpu.fields import FR_MOD, Fr
    from curdleproofs_tpu.ops import g1 as og
    from curdleproofs_tpu.ops import msm as omsm
    from curdleproofs_tpu.ops.fieldspec import ints_to_limbs

    n = int(os.environ.get("BENCH_N", 1 << 16))
    reps = int(os.environ.get("BENCH_REPS", 2))
    methods = os.environ.get("BENCH_METHODS", "ladder,hostsort").split(",")

    pts, acc, g7 = [], G1(), G1() * Fr(7)
    for _ in range(n):
        pts.append(acc)
        acc = acc + g7
    scs = [
        Fr(int.from_bytes(hashlib.sha256(f"b{i}".encode()).digest(), "little") % FR_MOD)
        for i in range(n)
    ]
    points = og.pack_points(pts)
    scalars = og.pack_scalars(scs)
    sc_np = np.asarray(ints_to_limbs([s.v for s in scs], 16), dtype=np.uint32)
    expect = msm_host(pts[:64], scs[:64])
    small = og.pack_scalars(scs[:64] + [Fr(0)] * (n - 64))
    small_np = np.asarray(
        ints_to_limbs([s.v for s in scs[:64]] + [0] * (n - 64), 16), dtype=np.uint32
    )

    out = {"n": n}
    for method in methods:
        c = int(os.environ.get("BENCH_C", omsm.pick_window(n)))

        def run(sv, sv_np):
            if method == "ladder":
                return omsm.msm_ladder(points, sv)
            if method == "hostsort":
                return omsm.msm_pippenger_hostsort(points, sv_np, c=c)
            if method == "stream":
                return omsm.msm_pippenger_stream(points, sv_np, c=c, routed=False)
            if method == "stream_routed":
                return omsm.msm_pippenger_stream(points, sv_np, c=c, routed=True)
            return omsm.msm_pippenger(points, sv, c=c)

        t0 = time.time()
        r0 = run(scalars, sc_np)
        compile_s = time.time() - t0
        assert run(small, small_np) == expect, f"{method}: wrong result"
        times = []
        for _ in range(reps):
            t0 = time.time()
            r = run(scalars, sc_np)
            times.append(time.time() - t0)
            assert r == r0
        out[method] = {
            "wall_s": round(min(times), 4),
            "compile_s": round(compile_s, 1),
            "c": c,
        }
        print(json.dumps({method: out[method]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
