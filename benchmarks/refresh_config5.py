#!/usr/bin/env python
"""Re-run benchmark config5 (sharded ladder MSM) and update report.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_all import bench_sharded_msm  # noqa: E402


def main():
    n = int(os.environ.get("BENCH_N", 1 << 18))
    t0 = time.time()
    result = bench_sharded_msm(n, seed=5)
    result["compile_s"] = round(time.time() - t0 - result["wall_s"], 1)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "report.json")
    report = json.load(open(path))
    report["config5_sharded_msm"] = result
    json.dump(report, open(path, "w"), indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
