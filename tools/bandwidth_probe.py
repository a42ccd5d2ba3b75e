"""Aggregate memory-bandwidth probe: the same large-array copy kernel
run by 1/2/8/32 concurrent processes. Explains the single-VM scaling
ceiling of non-cache-resident Spark stages: once the concurrent copies
saturate the socket's DRAM bandwidth, extra cores add nothing — a
limit that does NOT exist across nodes of a real cluster, where each
executor brings its own memory controllers.

Writes BENCH/bandwidth.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARR_MB = 512
REPS = 6


def worker(q):
    import numpy as np

    a = np.ones(ARR_MB * (1 << 20) // 8, dtype=np.float64)
    b = np.empty_like(a)
    # warm
    np.copyto(b, a)
    t0 = time.time()
    for _ in range(REPS):
        np.copyto(b, a)
    dt = time.time() - t0
    # copy reads + writes ARR_MB each way
    q.put(REPS * 2 * ARR_MB / dt / 1024.0)  # GB/s per process


def run(n: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(vals), 1)


def main() -> None:
    out = {"kernel": f"np.copyto {ARR_MB}MB x{REPS}", "aggregate_gb_s": {}}
    for n in (1, 2, 8, 32):
        best = max(run(n) for _ in range(3))
        out["aggregate_gb_s"][str(n)] = best
        print(n, "procs:", best, "GB/s aggregate")
    with open(os.path.join(REPO, "BENCH", "bandwidth.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
