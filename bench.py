"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Extra context fields beyond the driver contract: per-query row counts,
docs/sec for the flagship minhash pipeline, and the parallelism used
(for the N-vs-4N scaling report in BENCH/BASELINE.md, see
tools/run_scaling.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "minhash_dedup",
    "simhash_dedup",
    "exact_dedup",
    "ccnet_line_dedup",
    "substring_dedup",
    "jaccard_dedup",
    "text_stats",
    "lang_id_counts",
    "ann_topk",
    "embedding_near_dup_lsh",
]

# the sandbox VM has ~2x run-to-run noise; two passes, per-query min
N_PASSES = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from sparkdedup.session import get_spark

    spark = get_spark(app_name="sparkdedup-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    # agreement-check driver rows also compute an O(N^2) exact side;
    # bench measures the raw pipelines those rows wrap
    qmap["embedding_near_dup_lsh"] = entrymod.q_embedding_near_dup_lsh_raw
    qmap["minhash_dedup"] = entrymod.q_minhash_dedup_raw
    qmap["simhash_dedup"] = entrymod.q_simhash_dedup_raw
    per_query: dict[str, float] = {}
    rows: dict[str, int] = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for _ in range(N_PASSES):
        spark.catalog.clearCache()
        for name in BENCH_QUERIES:
            t0 = time.time()
            df = qmap[name](spark, sf_dir)
            rows[name] = df.count()
            dt = round(time.time() - t0, 3)
            per_query[name] = min(per_query.get(name, dt), dt)
            # unpersist this query's pipeline caches so the 10-query
            # loop doesn't accumulate persisted frames (VERDICT r2 #8)
            entrymod.release_all()
    total = round(sum(per_query.values()), 3)

    out = {
        "metric": "dedup_bench_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows": rows,
        "n_docs": n_docs,
        "minhash_docs_per_sec": round(n_docs / per_query["minhash_dedup"], 1),
        "cpus": cpus,
    }
    # headline sustained numbers from the 400k scaling matrix, if present
    matrix_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling_matrix.json")
    if os.path.exists(matrix_path):
        try:
            matrix = json.load(open(matrix_path))
            nd = matrix.get("n_docs", 0)
            out[f"sustained_{nd // 1000}k"] = {
                k: v["best_docs_per_sec"] for k, v in matrix.get("results", {}).items()
            }
            out["scaling_efficiency_2_to_8"] = matrix.get("efficiency_2_to_8")
            out["scaling_efficiency_8_to_32"] = matrix.get("efficiency_8_to_32")
        except Exception:
            pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
