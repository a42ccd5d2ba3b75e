"""Duplicate-pair quality (precision / recall / F1) against PLANTED
ground truth — the analogue of the reference's labeled benchmark
(tests/benchmark_core.py: per-pair recall/precision on
pinecone/core-2020 labels; our labels are the fixture's planted
clusters, FIXTURES.md T2).

Truth pairs are restricted to planted pairs whose actual word-n-gram
Jaccard >= the run threshold (the reference's recall definition —
a 0.7-threshold run is not supposed to find 0.3-Jaccard pairs).
Predicted pairs outside the planted truth are classified by their real
Jaccard, so accidental true-positives are not counted as errors.

Usage: python tools/quality_eval.py [n_docs]
Writes BENCH/quality.json.
"""

from __future__ import annotations

import json
import os
import sys
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def adjusted_rand_index(labels_a: list, labels_b: list) -> float:
    """ARI from the contingency table (Hubert & Arabie 1985) — the
    reference's NEWS-COPY scoring metric
    (/root/reference/tests/benchmark_news.py:39-47, which calls
    sklearn.metrics.adjusted_rand_score; plain-Python here, no sklearn
    in the container)."""
    from collections import Counter, defaultdict

    assert len(labels_a) == len(labels_b)
    n = len(labels_a)
    if n < 2:
        return 1.0

    def c2(x: int) -> int:
        return x * (x - 1) // 2

    cont: dict = defaultdict(int)
    for a, b in zip(labels_a, labels_b):
        cont[(a, b)] += 1
    sum_ij = sum(c2(v) for v in cont.values())
    sum_a = sum(c2(v) for v in Counter(labels_a).values())
    sum_b = sum(c2(v) for v in Counter(labels_b).values())
    total = c2(n)
    expected = sum_a * sum_b / total
    max_index = (sum_a + sum_b) / 2
    if max_index == expected:
        return 1.0
    return (sum_ij - expected) / (max_index - expected)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from pyspark.sql import functions as F

    from sparkdedup.config import MinHashConfig
    from sparkdedup.fixtures import generate_code_files
    from sparkdedup.minhash import minhash_dedup
    from sparkdedup.session import get_spark
    from tests.oracle import word_ngram_jaccard

    corpus, truth = generate_code_files(n_docs, seed=42, with_truth=True)
    texts = corpus["content"].tolist()

    spark = get_spark(app_name="quality", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(corpus).withColumn("__id__", F.col("doc_id")).persist()

    # planted same-cluster pairs with their true jaccard
    clusters: dict = {}
    for doc_id, c in zip(corpus["doc_id"], truth):
        if c >= 0:
            clusters.setdefault(int(c), []).append(int(doc_id))
    planted = {}
    for members in clusters.values():
        for a, b in combinations(sorted(members), 2):
            planted[(a, b)] = word_ngram_jaccard(texts[a], texts[b], 5)

    from sparkdedup.jaccard import jaccard_dedup

    report = {"n_docs": n_docs, "planted_pairs": len(planted)}
    for cfg_name, cfg in [
        ("default_thr0.7", MinHashConfig()),
        ("benchmark_thr0.5_b50r4", MinHashConfig(ngram=2, num_perm=200, b=50, r=4, threshold=0.5)),
        ("benchmark_jaccard_verified", MinHashConfig(ngram=2, num_perm=200, b=50, r=4, threshold=0.5)),
    ]:
        if cfg_name.endswith("verified"):
            res = jaccard_dedup(df, cfg, collect_metrics=False)
        else:
            res = minhash_dedup(df, cfg, collect_metrics=False)
        assign = {r["id"]: r["component"] for r in res.assignment.collect()}
        comp: dict = {}
        for doc_id, label in assign.items():
            comp.setdefault(label, []).append(doc_id)
        predicted = set()
        for members in comp.values():
            for a, b in combinations(sorted(members), 2):
                predicted.add((a, b))

        jac_n = 5 if cfg.ngram == 5 else cfg.ngram
        eligible = {p for p, j in planted.items() if j >= cfg.threshold}
        tp = len(predicted & eligible)
        # predicted pairs outside planted truth: check their real jaccard
        extra = [p for p in predicted if p not in planted]
        extra_true = sum(
            1 for a, b in extra if word_ngram_jaccard(texts[a], texts[b], jac_n) >= cfg.threshold
        )
        below = len(predicted) - tp - len(extra)  # planted but sub-threshold
        precision = (tp + extra_true) / max(len(predicted), 1)
        recall = tp / max(len(eligible), 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-9)

        # cluster-level ARI vs the raw planted labels (NEWS-COPY-style
        # scoring); unplanted/unassigned docs are singleton clusters
        truth_labels = [int(c) if c >= 0 else -(doc_id + 2) for doc_id, c in zip(corpus["doc_id"], truth)]
        pred_labels = [int(assign.get(int(d), -(int(d) + 2))) for d in corpus["doc_id"]]
        ari = adjusted_rand_index(truth_labels, pred_labels)
        report[cfg_name] = {
            "eligible_truth_pairs": len(eligible),
            "predicted_pairs": len(predicted),
            "true_positives": tp,
            "predicted_subthreshold_planted": below,
            "predicted_outside_truth": len(extra),
            "outside_truth_actually_dup": extra_true,
            "precision": round(precision, 4),
            "recall": round(recall, 4),
            "f1": round(f1, 4),
            "ari": round(ari, 4),
        }
        print(cfg_name, report[cfg_name])

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "quality.json"), "w") as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
