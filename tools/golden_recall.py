"""Large-corpus golden recall evidence: run the Spark MinHash + SimHash
pipelines against the independent reference-math oracle on an n-doc
seed-42 corpus and record dup-pair recall/precision.

Usage: python tools/golden_recall.py [n_docs]
Writes BENCH/golden_recall.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000

    from pyspark.sql import functions as F

    from sparkdedup.config import MinHashConfig, SimHashConfig
    from sparkdedup.fixtures import generate_code_files
    from sparkdedup.minhash import minhash_dedup
    from sparkdedup.session import get_spark
    from sparkdedup.simhash import simhash_dedup
    from tests.oracle import cluster_pairs, minhash_clusters, simhash_clusters

    corpus = generate_code_files(n_docs, seed=42)
    spark = get_spark(app_name="golden", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(corpus).withColumn("__id__", F.col("doc_id")).persist()

    report = {"n_docs": n_docs}

    def score(name, oracle_assign, oracle_kept, assignment_df):
        ours = {r["id"]: r["component"] for r in assignment_df.collect()}
        ours_full = {i: ours.get(i, i) for i in oracle_kept}
        op, sp = cluster_pairs(oracle_assign), cluster_pairs(ours_full)
        inter = len(op & sp)
        report[name] = {
            "oracle_pairs": len(op),
            "our_pairs": len(sp),
            "recall": round(inter / max(len(op), 1), 6),
            "precision": round(inter / max(len(sp), 1), 6),
        }
        print(name, report[name])

    mh_cfg = MinHashConfig()
    o_assign, o_kept = minhash_clusters(
        corpus["content"].tolist(), corpus["doc_id"].tolist(),
        ngram=5, min_length=5, num_perm=250, b=25, r=10, seed=42,
    )
    res = minhash_dedup(df, mh_cfg, collect_metrics=False)
    score("minhash_default", o_assign, o_kept, res.assignment)

    o_assign2, o_kept2 = minhash_clusters(
        corpus["content"].tolist(), corpus["doc_id"].tolist(),
        ngram=2, min_length=5, num_perm=200, b=50, r=4, seed=42,
    )
    res2 = minhash_dedup(df, MinHashConfig(ngram=2, num_perm=200, b=50, r=4), collect_metrics=False)
    score("minhash_benchmark_cfg", o_assign2, o_kept2, res2.assignment)

    sh_cfg = SimHashConfig()
    so_assign, so_kept = simhash_clusters(
        corpus["content"].tolist(), corpus["doc_id"].tolist(),
        ngram=3, min_length=5, f=64, bit_diff=3, num_bucket=4,
    )
    sres = simhash_dedup(df, sh_cfg, collect_metrics=False)
    score("simhash_default", so_assign, so_kept, sres.assignment)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "golden_recall.json"), "w") as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
