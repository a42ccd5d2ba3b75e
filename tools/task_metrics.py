"""Plan-parallelism evidence from Spark's own task metrics.

Wall-clock scaling on this single-VM sandbox is limited by the host
(shared memory subsystem, vCPU oversubscription), not by the job plan —
so this tool captures what a cluster scheduler actually sees: per-stage
task counts, task-time distribution (skew), and the serial fraction
(wall time not covered by parallelizable task work). On a real
multi-executor cluster, wall ~= total_task_time / slots + serial_time;
a low serial fraction and low task skew are the properties that make
N -> 4N executor scaling hold.

Usage: python tools/task_metrics.py [corpus_parquet] [cores]
Writes BENCH/task_metrics.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdedup_scale_400000.parquet"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import SparkSession

    from sparkdedup.config import MinHashConfig
    from sparkdedup.io import with_doc_id
    from sparkdedup.minhash import minhash_dedup

    spark = (
        SparkSession.builder.appName("task-metrics")
        .master(f"local[{cores}]")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    df = with_doc_id(spark.read.parquet(corpus).repartition(64), id_column="doc_id")
    t0 = time.time()
    res = minhash_dedup(df, MinHashConfig(), collect_metrics=False)
    survivors = res.kept.count()
    wall = time.time() - t0

    app_id = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete"))
    per_stage = []
    total_task_ms = 0
    for st in stages:
        sid = st["stageId"]
        att = st["attemptId"]
        try:
            tasks = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/taskList?length=5000"
                )
            )
        except Exception:
            continue
        durs = [t.get("duration", 0) for t in tasks if t.get("status") == "SUCCESS"]
        if not durs:
            continue
        total_task_ms += sum(durs)
        per_stage.append(
            {
                "stage": sid,
                "name": st.get("name", "")[:60],
                "n_tasks": len(durs),
                "task_ms_median": int(statistics.median(durs)),
                "task_ms_max": max(durs),
                "skew_max_over_median": round(max(durs) / max(statistics.median(durs), 1), 2),
                "stage_task_ms_total": sum(durs),
            }
        )

    per_stage.sort(key=lambda s: -s["stage_task_ms_total"])
    report = {
        "corpus": corpus,
        "cores": cores,
        "wall_seconds": round(wall, 1),
        "survivors": survivors,
        "total_task_seconds": round(total_task_ms / 1000, 1),
        "mean_task_concurrency": round(total_task_ms / 1000 / wall, 2),
        "n_stages": len(per_stage),
        "single_task_stages": sum(1 for s in per_stage if s["n_tasks"] == 1),
        "worst_skew_stages": [
            {k: s[k] for k in ("stage", "name", "n_tasks", "skew_max_over_median")}
            for s in sorted(per_stage, key=lambda s: -s["skew_max_over_median"])[:5]
            if s["n_tasks"] > 1
        ],
        "top_stages_by_task_time": per_stage[:8],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "task_metrics.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in ("wall_seconds", "total_task_seconds", "mean_task_concurrency", "n_stages", "single_task_stages")}))
    spark.stop()


if __name__ == "__main__":
    main()
