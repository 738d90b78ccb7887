#!/usr/bin/env python
"""Sweep stream-MSM configs (window bits c, window_batch) in one process.

Env: N (65536), REPS (3), CS (csv of c, default "12,13"), WBS (csv of
window_batch — an int or a +-joined schedule like "2+4+4", default "4"),
LANES (csv of scan lane widths, default current pick_lanes). Uses
random-dlog points like bench.py.
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    n = int(os.environ.get("N", 1 << 16))
    reps = int(os.environ.get("REPS", 3))
    cs = [int(x) for x in os.environ.get("CS", "12,13").split(",")]

    def parse_wb(s):
        return [int(x) for x in s.split("+")] if "+" in s else int(s)

    wbs = [parse_wb(x) for x in os.environ.get("WBS", "4").split(",")]
    lanes = [int(x) for x in os.environ.get("LANES", "0").split(",")]

    from curdleproofs_tpu.curve import G1, msm_host, mul_host_batch
    from curdleproofs_tpu.fields import FR_MOD, Fr
    from curdleproofs_tpu.ops import g1 as og
    from curdleproofs_tpu.ops import msm as omsm
    from curdleproofs_tpu.ops.fieldspec import ints_to_limbs

    t0 = time.perf_counter()
    dlogs = [
        Fr(
            int.from_bytes(
                hashlib.sha256(f"p{i}".encode()).digest()
                + hashlib.sha256(f"q{i}".encode()).digest(),
                "little",
            )
            % FR_MOD
        )
        for i in range(n)
    ]
    pts = mul_host_batch([G1()] * n, dlogs)
    scs = [
        Fr(int.from_bytes(hashlib.sha256(f"b{i}".encode()).digest(), "little") % FR_MOD)
        for i in range(n)
    ]
    print(f"inputs built in {time.perf_counter() - t0:.1f}s", flush=True)
    points = og.pack_points(pts)
    sc_np = np.asarray(ints_to_limbs([s.v for s in scs], 16), dtype=np.uint32)

    want = msm_host(pts[:128], scs[:128])

    from curdleproofs_tpu.ops import stream_scan as ostream

    for L in lanes:
        ostream._LANES = L
        for c in cs:
            for wb in wbs:
                # correctness spot check on this config (zero-padded scalars)
                chk_np = np.zeros_like(sc_np)
                chk_np[:, :128] = sc_np[:, :128]
                got = omsm.msm_pippenger_stream(
                    points, chk_np, c=c, window_batch=wb
                )
                ok = got == want
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    omsm.msm_pippenger_stream(
                        points, sc_np, c=c, window_batch=wb
                    )
                    ts.append(time.perf_counter() - t0)
                med = sorted(ts)[len(ts) // 2]
                print(
                    f"L={L} c={c} wb={wb}: check={'OK' if ok else 'FAIL'} "
                    f"median {med:.3f}s  all {['%.3f' % t for t in ts]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
