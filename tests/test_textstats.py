"""Text-analysis operator unit tests incl. NEWS-COPY preprocess parity
with a direct transcription of the reference
(/root/reference/text_dedup/utils/preprocess.py:41-59)."""

import pandas as pd
from pyspark.sql import functions as F

from sparkdedup.textstats import (
    doc_fingerprint,
    language_id,
    news_copy_preprocess,
    punct_ratio,
    quality_score,
    text_stats,
    whitespace_token_count,
    word_token_count,
)


def py_news_copy(text: str) -> str:
    chars_to_remove = r'"#$%&\()*+/:;<=>@[\\]^_`{|}~.?,!' + "'"
    text = text.replace("-\n", "").replace("\n", " ")
    text = text.translate(str.maketrans("", "", chars_to_remove))
    text = text.encode("ascii", "ignore").decode()
    return text


NEWS_CASES = [
    "Simple sentence.",
    "hyphen-\nbreak continues",
    "new\nline here",
    'quotes "and" symbols #$% kept-dash',
    "naïve café — unicode gone",
    "[brackets] {braces} (parens)",
]


def test_news_copy_matches_reference_transcription(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": NEWS_CASES}))
    rows = df.select("t", news_copy_preprocess(F.col("t")).alias("p")).collect()
    for r in rows:
        assert r["p"] == py_news_copy(r["t"]), r["t"]


def test_token_counts(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["one two  three", "", "   ", "a,b c"]}))
    rows = df.select(
        whitespace_token_count(F.col("t")).alias("ws"),
        word_token_count(F.col("t")).alias("wp"),
    ).collect()
    assert [r["ws"] for r in rows] == [3, 0, 0, 2]
    # word-piece: runs of word chars + single punctuation marks
    assert rows[3]["wp"] == 4  # a , b c


def test_punct_ratio_and_quality(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["abcd", "a,b!", ""]}))
    rows = df.select(
        F.round(punct_ratio(F.col("t")), 4).alias("p"),
        quality_score(F.col("t")).alias("q"),
    ).collect()
    assert rows[0]["p"] == 0.0
    assert rows[1]["p"] == 0.5
    assert rows[2]["p"] == 0.0
    assert 0.0 <= rows[0]["q"] <= 1.0


def test_language_id(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "t": [
                    "the cat and the dog is here",
                    "le chat et la maison est grande",
                    "el gato es una maravilla los dos",
                    "der hund und das haus ist gross",
                    "zzz qqq www",
                ]
            }
        )
    )
    rows = df.select(language_id(F.col("t")).alias("l")).collect()
    assert [r["l"] for r in rows] == ["en", "fr", "es", "de", "und"]


def test_fingerprint_is_md5(spark):
    import hashlib

    df = spark.createDataFrame(pd.DataFrame({"t": ["hello world"]}))
    row = df.select(doc_fingerprint(F.col("t")).alias("f")).first()
    assert row["f"] == hashlib.md5(b"hello world").hexdigest()


def test_text_stats_schema(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["some text here"]}))
    out = text_stats(df)
    assert out.columns == ["doc_id", "n_tokens", "n_chars", "punct_ratio", "quality", "lang_guess", "fingerprint"]
    assert out.count() == 1
