"""Scale evidence for the broadcast-free ANN dedup path (VERDICT r2 #1).

Synthesizes N 64-dim vectors as C tight clusters plus isolated points
(deterministic seed), runs `ann_dedup` with exact=False — the adaptive-k
loop over the IVF index whose search now shuffle-joins on `cell`
instead of broadcasting the corpus-sized query side — and records wall
time, rounds, k growth, edge count and survivors, plus an explicit
check that the search plan contains no pinned BroadcastExchange when
auto-broadcast is disabled.

Writes BENCH/ann_scale.json.
Usage: python tools/ann_scale.py [n_vectors] [cores]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from sparkdedup.ann import _unit_queries, build_ivf_index, ann_dedup, ivf_search
    from sparkdedup.config import ANNConfig
    from sparkdedup.session import get_spark

    corpus = f"/tmp/sparkdedup_ann_scale_{n}.parquet"
    if not os.path.exists(corpus):
        import pandas as pd

        rng = np.random.RandomState(3)
        n_clustered = n // 2
        cluster_size = 8
        n_clusters = n_clustered // cluster_size
        centers = rng.standard_normal((n_clusters, DIM))
        reps = np.repeat(centers, cluster_size, axis=0)
        clustered = reps + 0.03 * rng.standard_normal(reps.shape)
        isolated = rng.standard_normal((n - len(clustered), DIM))
        vecs = np.vstack([clustered, isolated])
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": [v.tolist() for v in vecs]}
        ).to_parquet(corpus, index=False)

    spark = get_spark(
        app_name=f"ann-scale-{cores}", master=f"local[{cores}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    vectors = spark.read.parquet(corpus).repartition(64)
    # auto-sized (~sqrt(N)) by build_ivf_index / ann_dedup since r4 —
    # no hand-picked cell count
    from sparkdedup.ann import auto_n_centroids, auto_n_probe

    n_centroids = auto_n_centroids(n)
    n_probe = auto_n_probe(n_centroids)
    cfg = ANNConfig(threshold=0.9)

    # plan check: unbounded-query search must not pin a BroadcastExchange
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # time the index BUILD separately: r5 sample-fits the KMeans above
    # 256*k training rows (faiss convention), so this stage should drop
    # visibly at 100k vectors vs the r4 full-corpus Lloyd fit
    tb = time.time()
    index = build_ivf_index(vectors, cfg, n_rows=n)  # derives ~sqrt(N)
    index.assigned.count()  # materialize the persisted assignment
    build_s = time.time() - tb
    sample_fit = n > 256 * n_centroids
    assert len(index.centroids) == n_centroids
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ivf_search(
            index, _unit_queries(vectors, cfg), 20, broadcast_queries=False
        ).explain("extended")
    physical = buf.getvalue().split("== Physical Plan ==")[-1]
    no_broadcast = "BroadcastExchange" not in physical
    index.release()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    t0 = time.time()
    res = ann_dedup(
        vectors, DIM, cfg, exact=False,
        collect_metrics=True,
    )
    wall = time.time() - t0

    report = {
        "n_vectors": n,
        "dim": DIM,
        "cores": cores,
        "n_centroids": n_centroids,
        "n_probe": n_probe,
        "index_build_s": round(build_s, 1),
        "kmeans_sample_fit": sample_fit,
        "wall_s": round(wall, 1),
        "vectors_per_sec": round(n / wall, 1),
        "n_distinct": res.metrics.n_distinct,
        "rounds": res.metrics.rounds,
        "k_final": res.metrics.k_final,
        "match_edges": res.metrics.match_edges,
        "rows_before": res.metrics.rows_before,
        "rows_after": res.metrics.rows_after,
        "search_plan_pins_no_broadcast": no_broadcast,
    }
    assert no_broadcast, "unbounded-query ivf_search pinned a BroadcastExchange"
    assert res.metrics.rows_after < n, "planted clusters must dedup"
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ann_scale.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
