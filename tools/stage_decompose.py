"""Per-stage decomposition from a Spark event log (eventlog_v2 dir or a
plain events file): stage wall, summed task run/CPU/GC/deserialize/
fetch-wait seconds and shuffle bytes — the evidence format used to
attribute cluster-scaling gaps to specific stages (BENCH/
cluster_stage_decomposition.json).

Usage: python tools/stage_decompose.py <eventlog-dir-or-file> [out.json]
(Disable event-log compression for runs meant for this tool:
spark.eventLog.compress=false.)
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict


def load(app_dir: str):
    stages = {}
    tasks = defaultdict(lambda: {"run_s": 0.0, "cpu_s": 0.0, "gc_s": 0.0,
                                 "deser_s": 0.0, "fetch_wait_s": 0.0,
                                 "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
                                 "n_tasks": 0})
    paths = sorted(glob.glob(os.path.join(app_dir, "events_*"))) or [app_dir]
    for path in paths:
        with open(path, errors="replace") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"].split("\n")[0][:80],
                        "wall_s": round(dur, 2),
                        "n_tasks": si["Number of Tasks"],
                        # epoch ms — lets callers window stages to reps
                        "submission_ms": si.get("Submission Time", 0),
                    }
                elif e == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    t = tasks[ev["Stage ID"]]
                    t["n_tasks"] += 1
                    t["run_s"] += m.get("Executor Run Time", 0) / 1000.0
                    t["cpu_s"] += m.get("Executor CPU Time", 0) / 1e9
                    t["gc_s"] += m.get("JVM GC Time", 0) / 1000.0
                    t["deser_s"] += m.get("Executor Deserialize Time", 0) / 1000.0
                    sm = m.get("Shuffle Read Metrics") or {}
                    t["fetch_wait_s"] += sm.get("Fetch Wait Time", 0) / 1000.0
                    t["shuffle_read_mb"] += (
                        sm.get("Remote Bytes Read", 0) + sm.get("Local Bytes Read", 0)
                    ) / 1e6
                    sw = m.get("Shuffle Write Metrics") or {}
                    t["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
    return stages, tasks


def main() -> None:
    app_dir = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    stages, tasks = load(app_dir)
    rows = []
    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["wall_s"]):
        t = tasks[sid]
        rows.append({"stage": sid, **s,
                     **{k: round(v, 1) for k, v in t.items() if k != "n_tasks"}})
    report = {
        "source": app_dir,
        "total_stage_wall_s": round(sum(s["wall_s"] for s in stages.values()), 1),
        "total_task_run_s": round(sum(t["run_s"] for t in tasks.values()), 1),
        "total_task_cpu_s": round(sum(t["cpu_s"] for t in tasks.values()), 1),
        "total_gc_s": round(sum(t["gc_s"] for t in tasks.values()), 1),
        "top_stages": rows[:15],
    }
    print(json.dumps(report, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
