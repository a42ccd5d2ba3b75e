"""Robustness: null content, empty inputs, single-row inputs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkdedup.config import MinHashConfig, SimHashConfig, SubstringConfig
from sparkdedup.minhash import minhash_dedup
from sparkdedup.simhash import simhash_dedup
from sparkdedup.suffix import substring_dedup


@pytest.fixture()
def with_nulls(spark):
    df = spark.createDataFrame(
        [(0, "a perfectly normal document with enough tokens to survive"),
         (1, None),
         (2, ""),
         (3, "a perfectly normal document with enough tokens to survive")],
        "doc_id long, content string",
    )
    return df.withColumn("__id__", F.col("doc_id"))


def test_minhash_null_content_dropped(with_nulls):
    res = minhash_dedup(with_nulls, MinHashConfig())
    kept = sorted(r["doc_id"] for r in res.kept.collect())
    assert kept == [0]  # null + empty dropped by filter; dup of 0 removed


def test_simhash_null_content_kept_unique(with_nulls):
    res = simhash_dedup(with_nulls, SimHashConfig())
    kept = sorted(r["doc_id"] for r in res.kept.collect())
    # null/empty docs have no fingerprint -> kept as unique rows
    assert kept == [0, 1, 2]


def test_substring_null_content(with_nulls):
    res = substring_dedup(with_nulls, SubstringConfig(k=20))
    kept = {r["doc_id"]: r["content"] for r in res.kept.collect()}
    # docs 0 and 3 share their whole >=20-byte text -> both spliced empty
    # and dropped; null row dropped by the length filter; empty dropped
    assert 1 not in kept and 2 not in kept
    assert 0 not in kept and 3 not in kept


def test_minhash_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, content string").withColumn(
        "__id__", F.col("doc_id")
    )
    res = minhash_dedup(df, MinHashConfig())
    assert res.kept.count() == 0


def test_minhash_single_row(spark):
    df = spark.createDataFrame(
        [(7, "just one single document with sufficient token count here")],
        "doc_id long, content string",
    ).withColumn("__id__", F.col("doc_id"))
    res = minhash_dedup(df, MinHashConfig())
    assert [r["doc_id"] for r in res.kept.collect()] == [7]


def test_with_doc_id_string_key_derives_stable_hash(spark):
    from sparkdedup.io import DOC_ID, with_doc_id

    df = spark.createDataFrame(
        [("r1/a.py", "x"), ("r2/b.py", "y")], "path string, content string"
    )
    out1 = {r["path"]: r[DOC_ID] for r in with_doc_id(df, "path").collect()}
    out2 = {r["path"]: r[DOC_ID] for r in with_doc_id(df, "path").collect()}
    assert out1 == out2  # stable across builds
    assert all(v is not None for v in out1.values())
    assert len(set(out1.values())) == 2


def test_with_doc_id_rejects_non_key_types(spark):
    import pytest as _pytest

    from sparkdedup.io import with_doc_id

    df = spark.createDataFrame([(1.5, "x")], "score double, content string")
    with _pytest.raises(TypeError, match="non-key type"):
        with_doc_id(df, "score")


def test_release_unpersists_pipeline_caches(spark):
    from sparkdedup.fixtures import generate_code_files

    corpus = generate_code_files(200, seed=11)
    df = spark.createDataFrame(corpus).withColumn("__id__", F.col("doc_id"))
    res = minhash_dedup(df, MinHashConfig())
    assert res.cached and any(
        c.storageLevel.useMemory or c.storageLevel.useDisk for c in res.cached
    )
    res.release()
    assert res.cached == []


def test_tune_worker_memory_installs_system_arrow_pool():
    """UDF bodies call tune_worker_memory() first; after it runs, Arrow
    allocations must come from the glibc-backed system pool (the
    default mimalloc pool munmaps arenas between batches, which
    re-faults pages every batch on slow-first-touch hosts)."""
    import pyarrow as pa

    from sparkdedup import tuning

    tuning._done = False
    tuning.tune_worker_memory()
    assert pa.default_memory_pool().backend_name == "system"
