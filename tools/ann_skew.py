"""ANN mega-cluster skew evidence (VERDICT r4 #2).

The adaptive-k ANN dedup loop now collapses identical vectors to a
min-id representative BEFORE querying the IVF index (two-stream
xxhash64 signature + star edges, ann.py ann_match_edges) — the ANN
analogue of BENCH/skew_megacluster.json's 200k-identical-docs MinHash
run. Without the collapse, M identical embeddings stay saturated until
k >= M and each accepts ~M matches: O(M^2) edges (at M=100k, ~5e9
accepted pairs) plus an M-struct collect_list group per query.

This tool plants M identical vectors + B random background vectors,
runs the full ann_dedup (exact=False) and asserts:
  * n_distinct == B + 1 (the identical block collapsed to one rep)
  * match_edges is O(M + B) — stars + sparse background matches
  * survivors == {0} + background non-matches (the planted clustering)
  * k never chased past the DISTINCT count (no saturation blow-up)

Writes BENCH/ann_skew_megacluster.json.
Usage: python tools/ann_skew.py [m_identical] [n_background] [cores]
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
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    bg = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from sparkdedup.ann import ann_dedup
    from sparkdedup.config import ANNConfig
    from sparkdedup.session import get_spark

    corpus = f"/tmp/sparkdedup_ann_skew_{m}_{bg}.parquet"
    if not os.path.exists(corpus):
        import pandas as pd

        rng = np.random.RandomState(9)
        base = rng.standard_normal(DIM)
        ident = np.tile(base, (m, 1))
        background = rng.standard_normal((bg, DIM))
        vecs = np.vstack([ident, background])
        pd.DataFrame(
            {"vec_id": np.arange(m + bg), "embedding": [v.tolist() for v in vecs]}
        ).to_parquet(corpus, index=False)

    spark = get_spark(
        app_name=f"ann-skew-{cores}", master=f"local[{cores}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    vectors = spark.read.parquet(corpus).repartition(64)
    n = m + bg

    t0 = time.time()
    res = ann_dedup(vectors, DIM, ANNConfig(threshold=0.95), exact=False, k0=20)
    wall = time.time() - t0

    met = res.metrics
    # random 64-dim background pairs at cos >= 0.95 are vanishingly
    # rare; edges must be ~ the M-1 stars, never the ~M^2/2 quadratic
    quadratic = m * (m - 1) // 2
    linear_bound = 2 * (m + bg)
    kept_ids_sample = [
        r["vec_id"] for r in res.kept.select("vec_id").orderBy("vec_id").limit(5).collect()
    ]
    report = {
        "m_identical": m,
        "n_background": bg,
        "dim": DIM,
        "cores": cores,
        "threshold": 0.95,
        "wall_s": round(wall, 1),
        "vectors_per_sec": round(n / wall, 1),
        "n_distinct": met.n_distinct,
        "match_edges": met.match_edges,
        "edges_linear_bound": linear_bound,
        "edges_if_quadratic": quadratic,
        "rounds": met.rounds,
        "k_final": met.k_final,
        "rows_before": met.rows_before,
        "rows_after": met.rows_after,
        "survivor_min_ids_sample": kept_ids_sample,
    }
    assert met.n_distinct == bg + 1, report
    assert met.match_edges <= linear_bound, report
    assert met.k_final <= 4 * (bg + 1), report  # k chased distinct count only
    assert met.rows_after <= bg + 1, report  # identical block -> 1 survivor
    assert kept_ids_sample[0] == 0, report  # min-id rep of the mega-cluster
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ann_skew_megacluster.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
