"""Exact-hash / ccnet unit tests, incl. Java-regex normalize parity
against a direct Python transcription of the reference normalize()
(/root/reference/text_dedup/utils/preprocess.py:11-38) using the
`regex` module (same engine family as the reference)."""

import pandas as pd
import pytest
import regex as pregex
from pyspark.sql import functions as F

from sparkdedup.config import CCNetConfig, ExactHashConfig
from sparkdedup.exact import ccnet_dedup, exact_hash_dedup, explode_lines, normalize_line

_DIGIT_RE = pregex.compile(r"\d")
_PUNCT_RE = pregex.compile(r"[\p{P}\p{C}\p{S}]+")


def py_normalize(line: str) -> str:
    """Reference normalize(), transcribed."""
    line = line.strip()
    if not line:
        return line
    line = line.lower()
    line = _DIGIT_RE.sub("0", line)
    line = _PUNCT_RE.sub("", line)
    return line


NORMALIZE_CASES = [
    "Hello, world!",
    "Hello, 123!",
    "  spaced   out  ",
    "MiXeD CaSe 42",
    "tabs\tand\nnewlines",
    "símbolos: €100 & §2 ©",
    "emoji 😀 test",
    "digits 0123456789",
    "",
    "   ",
    "punct-only !!!???...",
    "underscore_keeps_words",
]


def test_normalize_pins():
    # reference doctest pins (preprocess.py:25-30)
    assert py_normalize("Hello, world!") == "hello world"
    assert py_normalize("Hello, 123!\n\t\b") == "hello 000"


def test_spark_normalize_matches_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"line": NORMALIZE_CASES}))
    rows = df.select("line", normalize_line(F.col("line")).alias("norm")).collect()
    for r in rows:
        want = py_normalize(r["line"])
        assert r["norm"] == want, f"{r['line']!r}: {r['norm']!r} != {want!r}"


def test_exact_hash_keeps_lowest_id(spark):
    data = pd.DataFrame(
        {"doc_id": [5, 1, 9, 3], "content": ["dup", "dup", "uniq", "dup"]}
    )
    df = spark.createDataFrame(data).withColumn("__id__", F.col("doc_id"))
    for hf in ["md5", "sha256", "xxh64"]:
        out = exact_hash_dedup(df, ExactHashConfig(hash_func=hf))
        kept = sorted(r["doc_id"] for r in out.collect())
        assert kept == [1, 9], hf


def test_explode_lines_preserves_empties(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "content": ["a\n\nb\n"]}))
    df = df.withColumn("__id__", F.col("doc_id"))
    rows = explode_lines(df, "content").orderBy("line_no").collect()
    assert [r["line"] for r in rows] == ["a", "", "b", ""]


def test_ccnet_global_first_wins_order(spark):
    # line appears in docs 2 and 0: doc 0 (lower id) keeps it, whatever
    # insertion order; within a doc, the earlier line_no wins
    data = pd.DataFrame(
        {
            "doc_id": [2, 0],
            "content": ["shared line\nunique two", "shared line\nunique zero\nshared line"],
        }
    )
    df = spark.createDataFrame(data).withColumn("__id__", F.col("doc_id"))
    out = {r["doc_id"]: r["content"] for r in ccnet_dedup(df, CCNetConfig()).collect()}
    assert out[0] == "shared line\nunique zero"  # 2nd occurrence in doc0 removed
    assert out[2] == "unique two"


def test_ccnet_drops_emptied_docs(spark):
    data = pd.DataFrame({"doc_id": [0, 1], "content": ["only line", "only line"]})
    df = spark.createDataFrame(data).withColumn("__id__", F.col("doc_id"))
    out = {r["doc_id"] for r in ccnet_dedup(df, CCNetConfig()).collect()}
    assert out == {0}
