"""Chase the simhash bench variance (VERDICT r4 #4: 2.79-4.68 s spread
across 5 sf0.1 runs).

Runs q_simhash_dedup_raw N times in ONE warm session (the bench's
setting) with the Spark event log on, attributes every stage to its rep
by submission-time window, and reports per-rep wall plus the per-stage
(wall, task-run, task-CPU, GC) breakdown of the fastest and slowest
reps. If one stage owns the spread with run-seconds >> CPU-seconds it's
the sandbox (off-CPU stalls — the cluster-scaling rounds measured this
hypervisor's first-touch page faults at pathological speed); if a stage
burns real CPU only in slow reps, it's engine-side.

Writes BENCH/simhash_variance.json.
Usage: python tools/simhash_variance.py [reps] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/simhash_variance_eventlog"
    os.makedirs(evdir, exist_ok=True)
    for old in os.listdir(evdir):
        p = os.path.join(evdir, old)
        if os.path.isfile(p):
            os.unlink(p)
        else:
            import shutil

            shutil.rmtree(p)

    from sparkdedup.session import get_spark

    spark = get_spark(
        app_name="simhash-variance",
        master=f"local[{cores}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    windows = []
    counts = []
    for i in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        counts.append(entrymod.q_simhash_dedup_raw(spark, sf_dir).count())
        t1 = time.time()
        entrymod.release_all()
        windows.append((t0 * 1000, t1 * 1000, round(t1 - t0, 3)))
        print(f"rep {i}: {t1 - t0:.2f}s")
    assert len(set(counts)) == 1, counts
    spark.stop()

    # attribute stages to reps by submission time
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from stage_decompose import load

    app = [os.path.join(evdir, d) for d in os.listdir(evdir)]
    assert len(app) == 1, app
    stages, tasks = load(app[0])

    per_rep = [[] for _ in range(reps)]
    for sid, s in sorted(stages.items()):
        sub = s.get("submission_ms") or 0
        t = {k: round(v, 2) for k, v in tasks[sid].items() if k != "n_tasks"}
        for i, (lo, hi, _) in enumerate(windows):
            if lo <= sub <= hi:
                per_rep[i].append({"stage": sid, **s, **t})
                break

    walls = [w for _, _, w in windows]
    fast_i = walls.index(min(walls))
    slow_i = walls.index(max(walls))

    # per-rep run/CPU totals: if wall varies while CPU stays flat, the
    # spread is off-CPU (sandbox stalls), not engine work
    totals = []
    for repstages in per_rep:
        totals.append(
            {
                "n_stages": len(repstages),
                "run_s": round(sum(s["run_s"] for s in repstages), 1),
                "cpu_s": round(sum(s["cpu_s"] for s in repstages), 1),
                "gc_s": round(sum(s["gc_s"] for s in repstages), 1),
            }
        )

    def top(repstages, k=6):
        return sorted(repstages, key=lambda s: -s["wall_s"])[:k]

    mean = sum(walls) / len(walls)
    sd = (sum((w - mean) ** 2 for w in walls) / max(1, len(walls) - 1)) ** 0.5
    report = {
        "reps": reps,
        "cores": cores,
        "sf_dir": sf_dir,
        "walls_s": walls,
        "mean_s": round(mean, 3),
        "stdev_s": round(sd, 3),
        "per_rep_totals": totals,
        "fast_rep": {"idx": fast_i, "wall_s": walls[fast_i], "top_stages": top(per_rep[fast_i])},
        "slow_rep": {"idx": slow_i, "wall_s": walls[slow_i], "top_stages": top(per_rep[slow_i])},
    }
    with open(os.path.join(REPO, "BENCH", "simhash_variance.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
