"""Jaccard operators: JVM shingle/jaccard exprs vs the Python oracle,
and the verified-dedup pipeline."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkdedup.config import MinHashConfig
from sparkdedup.fixtures import generate_code_files
from sparkdedup.jaccard import jaccard, jaccard_dedup, shingle_array
from tests.oracle import word_ngram_jaccard


def test_jvm_jaccard_matches_python_oracle(spark):
    corpus = generate_code_files(80, seed=42)
    texts = corpus["content"].tolist()
    base = texts[0]
    df = spark.createDataFrame(corpus)
    base_sh = (
        df.filter(F.col("doc_id") == corpus["doc_id"][0])
        .select(shingle_array(F.col("content"), 5).alias("s"))
    )
    rows = (
        df.crossJoin(F.broadcast(base_sh))
        .select("doc_id", F.round(jaccard(shingle_array(F.col("content"), 5), F.col("s")), 6).alias("jac"))
        .collect()
    )
    for r in rows:
        doc = corpus[corpus["doc_id"] == r["doc_id"]]["content"].iloc[0]
        want = word_ngram_jaccard(doc, base, 5)
        assert abs(r["jac"] - want) < 1e-4, f"doc {r['doc_id']}: {r['jac']} vs {want}"


def test_jaccard_edge_cases(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": ["x y z w v"], "b": ["x y z w v"]}))
    row = df.select(
        jaccard(shingle_array(F.col("a"), 3), shingle_array(F.col("b"), 3)).alias("j")
    ).first()
    assert row["j"] == 1.0


def test_jaccard_dedup_verifies_candidates(spark):
    # two docs: high minhash collision probability but true jaccard
    # below threshold must NOT merge; identical docs must merge
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    variant = base.replace("gamma", "mu").replace("zeta", "nu").replace("iota", "xi")
    data = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "content": [base, base, variant],
        }
    )
    df = spark.createDataFrame(data).withColumn("__id__", F.col("doc_id"))
    res = jaccard_dedup(df, MinHashConfig(threshold=0.95))
    kept = sorted(r["doc_id"] for r in res.kept.select("doc_id").collect())
    assert 0 in kept and 1 not in kept  # exact dup verified & removed
    assert 2 in kept  # sub-threshold variant survives verification
