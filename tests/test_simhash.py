"""SimHash unit pins + E2E golden test vs the independent oracle."""

import pytest
from pyspark.sql import functions as F

from sparkdedup.config import SimHashConfig
from sparkdedup.fixtures import generate_code_files
from sparkdedup.simhash import (
    block_layout,
    compute_fingerprints,
    permutation_keys,
    simhash_dedup,
)
from tests.oracle import cluster_pairs, simhash_bucket_keys, simhash_clusters


def test_block_layout_reference_quirk():
    assert block_layout(64, 4) == [(16, 0), (16, 16), (16, 32), (16, 48)]
    # the reference's loop never applies the min-width solver result
    assert block_layout(64, 3) == [(22, 0), (22, 22), (20, 44)]
    assert block_layout(128, 4) == [(32, 0), (32, 32), (32, 64), (32, 96)]


def test_permutation_count():
    # permutations(range(b), b-k): P(4,1) = 4 (reference doctest:
    # _create_permutations(128, 3, 4) -> len 4, simhash.py:189-191)
    assert len(permutation_keys(128, 3, 4)) == 4
    assert len(permutation_keys(64, 3, 4)) == 4
    assert len(permutation_keys(64, 2, 4)) == 12


def test_majority_vote_reference_pin():
    # compute([int2ba(13352372148217134600), int2ba(5020219685658847592)])
    # == 74633958390507528 (simhash.py:292-295); for two inputs the
    # majority rule reduces to AND — verified against our bit math via
    # a synthetic two-shingle doc is impractical, so pin the rule itself
    a, b = 13352372148217134600, 5020219685658847592
    assert a & b == 74633958390507528


def test_fingerprint_basics():
    fps = compute_fingerprints(["hello world hello world", "hello world hello world", "completely different text here", "ab"], SimHashConfig())
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]
    assert fps[3] is None  # below min_length chars


def test_spark_bucket_keys_match_oracle(spark):
    """JVM bit arithmetic == reference Permutation int semantics."""
    from sparkdedup.simhash import bucket_key_columns

    fps = [0, -1, 74633958390507528, 13352372148217134600 - (1 << 64), 123456789]
    df = spark.createDataFrame([(v,) for v in fps], "fp long")
    cols = bucket_key_columns(F.col("fp"), 64, 3, 4)
    rows = df.select(F.col("fp"), F.array(*cols).alias("keys")).collect()
    for row in rows:
        fp_unsigned = row["fp"] & ((1 << 64) - 1)
        want = simhash_bucket_keys(fp_unsigned, 64, 3, 4)
        got = {(k["mask"], k["key"]) for k in row["keys"]}
        assert got == want, f"fp={fp_unsigned}"


@pytest.mark.parametrize("n_rows", [600])
def test_simhash_matches_oracle(spark, n_rows):
    corpus = generate_code_files(n_rows, seed=42)
    cfg = SimHashConfig(column="content")
    oracle_assign, oracle_kept = simhash_clusters(
        corpus["content"].tolist(),
        corpus["doc_id"].tolist(),
        ngram=cfg.ngram,
        min_length=cfg.min_length,
        f=cfg.f,
        bit_diff=cfg.bit_diff,
        num_bucket=cfg.num_bucket,
    )
    df = spark.createDataFrame(corpus).withColumn("__id__", F.col("doc_id"))
    res = simhash_dedup(df, cfg)
    ours = {row["id"]: row["component"] for row in res.assignment.collect()}
    ours_full = {i: ours.get(i, i) for i in oracle_kept}

    op = cluster_pairs(oracle_assign)
    sp = cluster_pairs(ours_full)
    assert len(op) >= 10, "fixture must produce simhash duplicate pairs"
    recall = len(op & sp) / len(op)
    precision = len(op & sp) / max(len(sp), 1)
    assert recall >= 0.99, f"recall {recall}"
    assert precision >= 0.99, f"precision {precision}"
