"""Exact-hash, Bloom-style, and ccnet line-level dedup — pure built-ins.

Reference semantics:
  * exact_hash (/root/reference/text_dedup/exact_hash.py:58-68): hash
    the whole document (md5/sha256/xxh3 of utf-8 bytes), keep the FIRST
    occurrence (lowest index) of each hash.
  * bloom_filter (/root/reference/text_dedup/bloom_filter.py:44-64):
    approximate version of the same first-wins; exactness is free in
    Spark, so it shares this implementation (false-positive drops of
    the reference are a bug, not a feature to reproduce).
  * ccnet (/root/reference/text_dedup/ccnet.py): explode documents into
    lines, normalize (strip → lower → digits→0 → strip punct/control/
    symbol, utils/preprocess.py:11-38), keep the globally-first
    occurrence of each normalized-line hash ordered by (doc, line),
    rebuild documents, drop now-empty ones.

Physical notes: first-wins is groupBy(hash).agg(min(key)) + join-back —
map-side combine makes mega duplicate groups a non-issue (no per-key
sort, no collect_list); Catalyst plans the join, AQE broadcasts the
minima table when small and skew-splits when not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkdedup.config import CCNetConfig, ExactHashConfig
from sparkdedup.io import DOC_ID


def content_hash(col: Column, hash_func: str) -> Column:
    if hash_func == "md5":
        return F.md5(col)
    if hash_func == "sha256":
        return F.sha2(col, 256)
    if hash_func in ("xxh64", "xxh3"):
        # JVM-side 64-bit hash; not byte-compatible with the reference's
        # xxh3 but dedup semantics (equality) are hash-agnostic.
        return F.xxhash64(col)
    raise ValueError(f"unknown hash_func {hash_func}")


def exact_hash_dedup(
    df: DataFrame, cfg: ExactHashConfig = ExactHashConfig(), id_col: str = DOC_ID
) -> DataFrame:
    """Keep the lowest-id row of every byte-identical content group.

    One hash pass: the group-min aggregation is the only consumer of
    the content hash; the probe side rejoins on the id alone (ids are
    unique — with_doc_id's contract — so "id is some group's minimum"
    identifies exactly the surviving rows). The previous join on
    (hash, id) hashed the content a second time on the probe side AND
    shuffled the survivors by the wide hash key."""
    h = content_hash(F.col(cfg.column), cfg.hash_func).alias("__h__")
    firsts = (
        df.select(h, F.col(id_col))
        .groupBy("__h__")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(firsts, on=id_col, how="leftsemi")


def bloom_filter_dedup(
    df: DataFrame, cfg: ExactHashConfig = ExactHashConfig(), id_col: str = DOC_ID
) -> DataFrame:
    """Reference bloom mode, exact in Spark (see module docstring)."""
    return exact_hash_dedup(df, cfg, id_col)


# --- ccnet ---------------------------------------------------------------

# Java-regex equivalents of the reference's normalize()
# (utils/preprocess.py:11-38). (?U) turns on unicode character classes
# to match Python's `regex` module semantics.
_STRIP = r"(?U)^\s+|\s+$"
_DIGIT = r"(?U)\d"
_PUNCT = r"[\p{P}\p{C}\p{S}]+"


def normalize_line(col: Column) -> Column:
    """Column expression for ccnet line normalization."""
    stripped = F.regexp_replace(col, _STRIP, "")
    lowered = F.lower(stripped)
    digits = F.regexp_replace(lowered, _DIGIT, "0")
    return F.regexp_replace(digits, _PUNCT, "")


def explode_lines(df: DataFrame, column: str, id_col: str = DOC_ID) -> DataFrame:
    """(id, line_no, line) table — one row per document line."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(column), "\n", -1)).alias("line_no", "line"),
    )


def ccnet_hashed_lines(df: DataFrame, cfg: CCNetConfig, id_col: str = DOC_ID) -> DataFrame:
    """(id, line_no, line, __lh__) — normalized-line hash per line."""
    return explode_lines(df, cfg.column, id_col).withColumn(
        "__lh__", content_hash(normalize_line(F.col("line")), cfg.hash_func)
    )


def ccnet_line_firsts(df: DataFrame, cfg: CCNetConfig, id_col: str = DOC_ID) -> DataFrame:
    """The expensive global aggregation: first (doc, line) occurrence of
    each normalized-line hash. This is the stage a resumable job
    materializes — min over a packed struct keeps it a skew-immune
    partial aggregation."""
    return ccnet_hashed_lines(df, cfg, id_col).groupBy("__lh__").agg(
        F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("first")
    )


def ccnet_rebuild(
    df: DataFrame, firsts: DataFrame, cfg: CCNetConfig = CCNetConfig(), id_col: str = DOC_ID
) -> DataFrame:
    """Rebuild documents keeping only their globally-first lines
    (``firsts`` may come from ``ccnet_line_firsts`` or a staged parquet)."""
    lines = ccnet_hashed_lines(df, cfg, id_col)
    kept_lines = (
        lines.join(firsts, on="__lh__")
        .filter((F.col(f"first.{id_col}") == F.col(id_col)) & (F.col("first.line_no") == F.col("line_no")))
        .drop("first", "__lh__")
    )
    rebuilt = (
        kept_lines.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s.line,
                ),
                "\n",
            ).alias("__rebuilt__")
        )
        .filter(F.length("__rebuilt__") > 0)
    )
    return (
        df.drop(cfg.column)
        .join(rebuilt, on=id_col, how="inner")
        .withColumnRenamed("__rebuilt__", cfg.column)
    )


def ccnet_dedup(
    df: DataFrame, cfg: CCNetConfig = CCNetConfig(), id_col: str = DOC_ID
) -> DataFrame:
    """Line-level dedup: globally-first occurrence of each normalized
    line survives; documents are rebuilt in original line order and
    empty documents dropped (ccnet.py:166-194).

    Fused single-pass plan: the winning LINE rides inside the min-struct
    aggregation — ``min(struct(id, line_no, line))`` per line hash —
    so the corpus is exploded/normalized ONCE and there is no join back
    onto a second hashed-lines computation (the staged
    ccnet_line_firsts/ccnet_rebuild pair keeps the two-step shape
    because its materialized firsts table deliberately excludes line
    text). (id, line_no) is unique per line, so the struct minimum
    picks exactly the globally-first occurrence; the trailing ``line``
    field never influences the comparison. Map-side partial aggregation
    keeps mega-duplicate lines skew-immune, and shuffle bytes drop to
    <= one row per distinct line hash per map partition (the old probe
    side shuffled EVERY line with its text)."""
    lines = ccnet_hashed_lines(df, cfg, id_col)
    kept_lines = (
        lines.groupBy("__lh__")
        .agg(F.min(F.struct(F.col(id_col), F.col("line_no"), F.col("line"))).alias("f"))
        .select(
            F.col(f"f.{id_col}").alias(id_col),
            F.col("f.line_no").alias("line_no"),
            F.col("f.line").alias("line"),
        )
    )
    rebuilt = (
        kept_lines.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s.line,
                ),
                "\n",
            ).alias("__rebuilt__")
        )
        .filter(F.length("__rebuilt__") > 0)
    )
    return (
        df.drop(cfg.column)
        .join(rebuilt, on=id_col, how="inner")
        .withColumnRenamed("__rebuilt__", cfg.column)
    )
