"""Exact-substring dedup: rolling-hash unit tests + E2E vs a
brute-force dict-counting oracle (independent implementation: boolean
position mask instead of interval merging)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkdedup.config import SubstringConfig
from sparkdedup.fixtures import LICENSE_HEADER, generate_code_files
from sparkdedup.suffix import _B1, _B1_INV, rolling_hashes, splice_out, substring_dedup


def brute_force_substring_dedup(texts, k):
    """Oracle: count k-byte windows over the corpus; remove every byte
    covered by a window occurring more than once; drop emptied docs."""
    from collections import Counter

    counts = Counter()
    encoded = [t.encode("utf-8") for t in texts]
    for data in encoded:
        for i in range(len(data) - k + 1):
            counts[data[i : i + k]] += 1
    out = []
    for data in encoded:
        mask = np.zeros(len(data), dtype=bool)
        for i in range(len(data) - k + 1):
            if counts[data[i : i + k]] > 1:
                mask[i : i + k] = True
        kept = bytes(data[i] for i in range(len(data)) if not mask[i])
        out.append(kept.decode("utf-8", errors="ignore"))
    return out


def test_rolling_hash_matches_direct():
    rng = np.random.RandomState(0)
    data = rng.randint(0, 256, size=200).astype(np.uint8)
    k = 13
    hs = rolling_hashes(data, k, _B1, _B1_INV)
    assert hs.size == 200 - k + 1
    with np.errstate(over="ignore"):
        pows = np.array([int(_B1) ** j % (1 << 64) for j in range(k)], dtype=np.uint64)
        for i in [0, 1, 57, 187]:
            direct = np.uint64(0)
            direct = (data[i : i + k].astype(np.uint64) * pows).sum(dtype=np.uint64)
            assert hs[i] == direct


def test_rolling_hash_equal_windows_collide_only_when_equal():
    data = np.frombuffer(b"abcabcabcabc", dtype=np.uint8)
    hs = rolling_hashes(data, 3, _B1, _B1_INV)
    assert hs[0] == hs[3] == hs[6] == hs[9]  # "abc" everywhere
    assert hs[0] != hs[1]


def test_splice_out_union_semantics():
    text = "0123456789"
    # windows at 0 and 2 with k=3 -> union [0,5) removed
    assert splice_out(text, [0, 2], 3) == "56789"
    # disjoint windows
    assert splice_out(text, [0, 7], 3) == "3456"
    # empty
    assert splice_out(text, [], 3) == text


def test_substring_e2e_matches_bruteforce(spark):
    corpus = generate_code_files(300, seed=42)
    texts = corpus["content"].tolist()
    k = 80
    oracle_out = brute_force_substring_dedup(texts, k)
    expect = {
        int(d): t for d, t in zip(corpus["doc_id"], oracle_out) if len(t) > 0
    }

    df = spark.createDataFrame(corpus).withColumn("__id__", F.col("doc_id"))
    res = substring_dedup(df, SubstringConfig(column="content", k=k))
    got = {row["doc_id"]: row["content"] for row in res.kept.select("doc_id", "content").collect()}
    assert set(got) == set(expect)
    mism = [i for i in got if got[i] != expect[i]]
    assert not mism, f"content mismatch for ids {mism[:5]}"
    # license headers are planted >= 80 bytes shared: they must be gone
    assert res.metrics.duplicated_windows > 0
    for i, t in got.items():
        assert LICENSE_HEADER not in t


def test_substring_no_dups_is_identity(spark):
    import pandas as pd

    data = pd.DataFrame(
        {"doc_id": [0, 1], "content": ["totally unique first document text", "another unrelated second document"]}
    )
    df = spark.createDataFrame(data).withColumn("__id__", F.col("doc_id"))
    res = substring_dedup(df, SubstringConfig(column="content", k=20))
    got = {r["doc_id"]: r["content"] for r in res.kept.collect()}
    assert got == {0: data["content"][0], 1: data["content"][1]}
