"""E2E golden test: Spark MinHash-LSH pipeline vs the independent NumPy
oracle (reference-algorithm transcription) on the deterministic corpus.

Acceptance bar (BASELINE.json): dup-pair recall >= 0.99 at identical
shingle/permutation/band config; per-row sha256(content) invariant.
With identical hash math both paths should in fact agree exactly.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from sparkdedup.config import MinHashConfig
from sparkdedup.fixtures import generate_code_files
from sparkdedup.minhash import band_edges, minhash_bands, minhash_dedup
from tests.oracle import cluster_pairs, minhash_clusters

N_ROWS = 600


@pytest.fixture(scope="module")
def corpus():
    return generate_code_files(N_ROWS, seed=42)


@pytest.fixture(scope="module")
def corpus_df(spark, corpus):
    df = spark.createDataFrame(corpus)
    return df.withColumn("__id__", F.col("doc_id")).persist()


def _our_assignment(result, kept_ids):
    assign = {row["id"]: row["component"] for row in result.assignment.collect()}
    return {i: assign.get(i, i) for i in kept_ids}


@pytest.mark.parametrize(
    "cfg",
    [
        MinHashConfig(ngram=5, min_length=5, num_perm=250, b=25, r=10),  # defaults
        MinHashConfig(ngram=2, min_length=5, num_perm=200, b=50, r=4),  # benchmark cfg
    ],
    ids=["default-250-25x10", "bench-200-50x4"],
)
def test_minhash_matches_oracle(spark, corpus, corpus_df, cfg):
    b, r = cfg.resolved_bands()
    oracle_assign, oracle_kept = minhash_clusters(
        corpus["content"].tolist(),
        corpus["doc_id"].tolist(),
        ngram=cfg.ngram,
        min_length=cfg.min_length,
        num_perm=cfg.num_perm,
        b=b,
        r=r,
        seed=cfg.seed,
    )

    result = minhash_dedup(corpus_df, cfg)

    # same length-filter survivors
    kept_ids = {row["__id__"] for row in result.kept.select("__id__").collect()}
    ours_assign = _our_assignment(result, oracle_kept)

    oracle_p = cluster_pairs(oracle_assign)
    ours_p = cluster_pairs(ours_assign)
    assert len(oracle_p) > 50, "fixture must contain planted duplicate pairs"
    recall = len(oracle_p & ours_p) / len(oracle_p)
    precision = len(oracle_p & ours_p) / max(len(ours_p), 1)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99"
    assert precision >= 0.99, f"dup-pair precision {precision:.4f} < 0.99"

    # survivors == component minima of the oracle partition (modulo the
    # tiny pair differences already covered by the recall bar)
    oracle_survivors = {i for i, label in oracle_assign.items() if label == i}
    sym_diff = kept_ids ^ oracle_survivors
    assert len(sym_diff) <= max(2, int(0.01 * len(oracle_survivors)))


def test_sha256_invariant_and_schema(spark, corpus, corpus_df):
    cfg = MinHashConfig()
    result = minhash_dedup(corpus_df, cfg)
    out = result.kept.select("doc_id", "content").collect()
    input_sha = {
        int(row.doc_id): hashlib.sha256(row.content.encode()).hexdigest()
        for row in corpus.itertuples(index=False)
    }
    for row in out:
        assert hashlib.sha256(row.content.encode()).hexdigest() == input_sha[row.doc_id]
    # output keeps the input schema (minus temp columns)
    assert set(result.kept.columns) == {"doc_id", "repo", "path", "commit", "lang", "content", "__id__"}


def test_band_edges_point_to_group_min(spark, corpus_df):
    cfg = MinHashConfig(ngram=5, min_length=5, num_perm=250, b=25, r=10)
    bands = minhash_bands(corpus_df, cfg)
    edges = band_edges(bands)
    rows = edges.collect()
    assert all(row["dst"] < row["src"] for row in rows)


def test_short_docs_dropped(spark, corpus, corpus_df):
    cfg = MinHashConfig()
    result = minhash_dedup(corpus_df, cfg)
    kept_ids = {row["__id__"] for row in result.kept.select("__id__").collect()}
    import re

    non_alpha = re.compile(r"\W", re.UNICODE)
    for row in corpus.itertuples(index=False):
        if len(non_alpha.split(row.content.lower())) < cfg.min_length:
            assert row.doc_id not in kept_ids


@pytest.mark.parametrize("hash_bits", [16, 64])
def test_minhash_hash_bits_variants_match_oracle(spark, corpus, corpus_df, hash_bits):
    """16-bit and legacy-datasketch 64-bit arithmetic modes
    (reference HASH_CONFIG, minhash.py:289-296)."""
    cfg = MinHashConfig(ngram=5, min_length=5, num_perm=250, b=25, r=10, hash_bits=hash_bits)
    from tests.oracle import minhash_clusters as mc

    oracle_assign, oracle_kept = mc(
        corpus["content"].tolist(),
        corpus["doc_id"].tolist(),
        ngram=5, min_length=5, num_perm=250, b=25, r=10,
        seed=cfg.seed, hash_bits=hash_bits,
    )
    result = minhash_dedup(corpus_df, cfg)
    ours = _our_assignment(result, oracle_kept)
    op, sp = cluster_pairs(oracle_assign), cluster_pairs(ours)
    assert len(op) > 50
    assert len(op & sp) / len(op) >= 0.99
    assert len(op & sp) / max(len(sp), 1) >= 0.99


def test_sha1_base_hash_signature_parity():
    """base_hash='sha1' (reference non-Spark default): the band
    signature equals a direct per-shingle sha1 + permute + min oracle."""
    import hashlib
    import struct

    import numpy as np

    from sparkdedup.config import MinHashConfig
    from sparkdedup.hashing import generate_permutations
    from sparkdedup.minhash import compute_band_signatures
    from sparkdedup.shingle import word_shingles

    cfg = MinHashConfig(base_hash="sha1", num_perm=32, b=8, r=4)
    text = "the quick brown fox jumps over the lazy dog again and again today"
    [sig] = compute_band_signatures([text], cfg)
    assert sig is not None and len(sig) == 8

    prime = np.uint32((1 << 32) - 5)
    a, bcoef = generate_permutations(32, int(prime), cfg.seed, dtype=np.uint32)
    hs = np.array(
        sorted(
            struct.unpack("<I", hashlib.sha1(s).digest()[:4])[0]
            for s in word_shingles(text, cfg.ngram, cfg.min_length)
        ),
        dtype=np.uint32,
    )
    with np.errstate(over="ignore"):
        ph = (hs[:, None] * a[None, :] + bcoef[None, :]) % prime & np.uint32(0xFFFFFFFF)
    mins = ph.min(axis=0)
    want = [mins[i * 4 : (i + 1) * 4].tobytes() for i in range(8)]
    assert sig == want


def test_sha1_base_hash_dedups_planted_duplicates(spark):
    from sparkdedup.config import MinHashConfig
    from sparkdedup.fixtures import generate_code_files
    from sparkdedup.minhash import minhash_dedup

    corpus = generate_code_files(300, seed=42)
    df = spark.createDataFrame(corpus).withColumn("__id__", F.col("doc_id"))
    res_sha = minhash_dedup(df, MinHashConfig(base_hash="sha1"))
    res_xxh = minhash_dedup(df, MinHashConfig())
    # same near-identical planted dups -> identical surviving sets
    sha_ids = {r["doc_id"] for r in res_sha.kept.select("doc_id").collect()}
    xxh_ids = {r["doc_id"] for r in res_xxh.kept.select("doc_id").collect()}
    assert sha_ids == xxh_ids
