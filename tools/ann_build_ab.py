"""A/B for the IVF index-build cost (VERDICT r4 #1): KMeans trained on
the full corpus vs on the bounded ~256-per-centroid sample
(`sparkdedup.ann._KMEANS_TRAIN_PER_CENTROID`, the faiss convention the
round-5 sample-fit adopts).

Both arms derive the SAME k = auto_n_centroids(N) and both time the
complete build (fit + full-corpus assign + persist materialization); the
only difference is the training-set size. Full-corpus Lloyd is
O(N·k·dim·iters) — at k=√N that is O(N^1.5), which makes the index
BUILD the dominant job at 100 TB; the sampled fit is O(k²·dim·iters)
with a full-corpus assign pass that both arms pay anyway.

Writes BENCH/ann_build_ab.json.
Usage: python tools/ann_build_ab.py [n_vectors] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import sparkdedup.ann as ann
    from sparkdedup.ann import auto_n_centroids, build_ivf_index
    from sparkdedup.config import ANNConfig
    from sparkdedup.session import get_spark

    corpus = f"/tmp/sparkdedup_annbuild_{n}.parquet"
    if not os.path.exists(corpus):
        import pandas as pd

        rng = np.random.RandomState(11)
        vecs = rng.standard_normal((n, DIM))
        pd.DataFrame(
            {"vec_id": np.arange(n), "embedding": [v.tolist() for v in vecs]}
        ).to_parquet(corpus, index=False)

    spark = get_spark(
        app_name=f"ann-build-ab-{cores}", master=f"local[{cores}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    vectors = spark.read.parquet(corpus).repartition(64)
    cfg = ANNConfig()
    k = auto_n_centroids(n)
    train_cap = ann._KMEANS_TRAIN_PER_CENTROID * k

    def timed_build(per_centroid_cap: int) -> float:
        old = ann._KMEANS_TRAIN_PER_CENTROID
        ann._KMEANS_TRAIN_PER_CENTROID = per_centroid_cap
        try:
            t0 = time.time()
            index = build_ivf_index(vectors, cfg, n_rows=n)
            index.assigned.count()  # materialize persist: the full build
            dt = time.time() - t0
            index.assigned.unpersist()
            return round(dt, 1)
        finally:
            ann._KMEANS_TRAIN_PER_CENTROID = old

    # warm the session/scan once so neither arm pays first-job setup
    vectors.count()
    sample_s = timed_build(ann._KMEANS_TRAIN_PER_CENTROID)
    full_s = timed_build(10**9)  # cap >> N: trains on the full corpus

    report = {
        "sample_fit_256_per_centroid": {"build_s": sample_s, "n_centroids": k},
        "full_corpus_fit": {"build_s": full_s, "n_centroids": k},
        "n_vectors": n,
        "dim": DIM,
        "cores": cores,
        "train_rows_sampled": min(n, train_cap),
        "speedup": round(full_s / sample_s, 2),
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "BENCH", "ann_build_ab.json"), "w") as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
