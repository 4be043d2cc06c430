"""Quick host-health probe: aggregate memory bandwidth at several process
counts. The VM shares a physical host; when co-tenant load throttles memory
bandwidth, every bandwidth-bound Spark job stops scaling past ~4 threads NO
MATTER THE CODE (measured: aggregate 0.93 GB/s at 16 procs on a bad day vs
2.5 GB/s at 4 — a healthy box does 10-30 GB/s and r1 measured 4->16 Spark
scaling at 1.005 efficiency on one). bench_scaling records this probe next
to its results so a FAIL can be attributed to the environment with data.

Usage: python tools/host_health.py  -> one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _copy_bw(_):
    import numpy as np

    a = np.ones(100_000_000 // 8)  # 100 MB
    t0 = time.perf_counter()
    for _ in range(3):
        b = a.copy()  # noqa: F841
    dt = time.perf_counter() - t0
    return 3 * a.nbytes * 2 / dt


def probe() -> dict:
    out = {}
    for procs in (1, 4, 16):
        with mp.Pool(procs) as p:
            r = p.map(_copy_bw, range(procs))
        out[f"membw_{procs}p_GBs"] = round(sum(r) / 1e9, 2)
    out["membw_scaling_4_to_16"] = round(
        out["membw_16p_GBs"] / max(out["membw_4p_GBs"], 1e-9), 3
    )
    out["healthy"] = out["membw_16p_GBs"] >= 5.0 and out["membw_scaling_4_to_16"] >= 1.5
    return out


if __name__ == "__main__":
    print(json.dumps(probe()))
