"""Exact-substring dedup (suffix-array-mode semantics, Spark-native).

Reference behavior (/root/reference/text_dedup/suffix_array.py): build a
suffix array over the concatenated corpus bytes (external google-research
tool), find duplicate byte ranges of length >= k appearing elsewhere in
the corpus ("self-similar" — ALL occurrences are removed), map ranges
back into per-doc slices, merge (suffix_array.py:31-128), splice the
bytes out (clean_up, suffix_array.py:270-299), drop emptied docs.

Spark-native redesign (SURVEY.md §7.4): a duplicated substring of
length >= k contains a duplicated k-byte window, and every duplicated
k-byte window IS a duplicated substring of length k. Therefore the
union of duplicated k-windows == the union of all duplicated substrings
of length >= k — exactly what the reference removes under its
"overlapping" merge. Pipeline:

  1. per doc, 128-bit rolling fingerprints (two independent
     multiplicative Rabin-Karp hashes mod 2^64, odd bases => O(n)
     vectorized via invertible prefix products) of every k-byte window
     at stride s (s=1 exact; s>1 trades exactness for an s-fold shuffle
     reduction and still guarantees detection of runs >= k+s-1);
  2. groupBy fingerprint, count > 1 (duplicates INCLUDING repeats
     within one document, matching corpus-level suffix-array behavior)
     — map-side combine, skew-immune; join the (small) duplicated
     fingerprint set back (AQE broadcasts it when small);
  3. per doc, union-merge duplicated window offsets and splice the
     bytes out in one Arrow-batched UDF; drop emptied docs.

Note on merge strategies: with fixed-length k-windows the reference's
"longest" strategy (drop contained intervals) never drops anything
(window stops strictly increase with starts) and clean_up removes the
union of overlapping slices anyway — both strategies coincide here;
the `strategy` config is accepted for API parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkdedup.config import SubstringConfig
from sparkdedup.io import DOC_ID

_B1 = np.uint64(1000003)  # odd bases -> invertible mod 2^64
_B2 = np.uint64(998244353)


def _inv_u64(b: np.uint64) -> np.uint64:
    """Multiplicative inverse of an odd number mod 2^64 (Newton)."""
    x = np.uint64(1)
    with np.errstate(over="ignore"):
        for _ in range(6):
            x = x * (np.uint64(2) - b * x)
    return x


_B1_INV = _inv_u64(_B1)
_B2_INV = _inv_u64(_B2)


def rolling_hashes(data: np.ndarray, k: int, base: np.uint64, base_inv: np.uint64) -> np.ndarray:
    """All k-window hashes of a uint8 array, O(n) vectorized.

    h[i] = sum_{j<k} data[i+j] * base^j  (mod 2^64), computed as
    (S[i+k]-S[i]) * base^-i with S the prefix sum of data[j]*base^j.
    """
    n = data.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pows = np.ones(n, dtype=np.uint64)
        pows[1:] = base
        np.cumprod(pows, out=pows)  # base^i
        inv_pows = np.ones(n - k + 1, dtype=np.uint64)
        inv_pows[1:] = base_inv
        np.cumprod(inv_pows, out=inv_pows)  # base^-i
        terms = data.astype(np.uint64) * pows
        prefix = np.concatenate(([np.uint64(0)], np.cumsum(terms, dtype=np.uint64)))
        return (prefix[k:] - prefix[: n - k + 1]) * inv_pows


_WIN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("h1", LongType()),
            StructField("h2", LongType()),
            StructField("off", IntegerType()),
        ]
    )
)


def make_window_udf(cfg: SubstringConfig):
    """UDF: content -> array<struct(h1,h2,off)> of k-byte window
    fingerprints at the configured stride."""

    @pandas_udf(_WIN_SCHEMA)
    def windows(texts: pd.Series) -> pd.Series:
        from sparkdedup.tuning import tune_worker_memory

        tune_worker_memory()
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            h1 = rolling_hashes(data, cfg.k, _B1, _B1_INV)
            if h1.size == 0:
                out.append([])
                continue
            h2 = rolling_hashes(data, cfg.k, _B2, _B2_INV)
            offs = np.arange(h1.size, dtype=np.int64)
            if cfg.stride > 1:
                sel = slice(None, None, cfg.stride)
                h1, h2, offs = h1[sel], h2[sel], offs[sel]
            out.append(
                list(zip(h1.view(np.int64).tolist(), h2.view(np.int64).tolist(), offs.tolist()))
            )
        return pd.Series(out)

    return windows


def splice_out(text: str, offsets: List[int], k: int) -> str:
    """Remove the union of [off, off+k) byte ranges (reference clean_up
    semantics, suffix_array.py:270-299; lossy utf-8 decode)."""
    data = bytearray(text.encode("utf-8"))
    result = bytearray()
    pos = 0
    cur_start: Optional[int] = None
    cur_end = -1
    for off in sorted(offsets):
        if cur_start is None:
            cur_start, cur_end = off, off + k
        elif off <= cur_end:
            cur_end = max(cur_end, off + k)
        else:
            result.extend(data[pos:cur_start])
            pos = cur_end
            cur_start, cur_end = off, off + k
    if cur_start is not None:
        result.extend(data[pos:cur_start])
        pos = cur_end
    result.extend(data[pos:])
    return result.decode("utf-8", errors="ignore")


def make_splice_udf(cfg: SubstringConfig):
    @pandas_udf(StringType())
    def splice(texts: pd.Series, offs: pd.Series) -> pd.Series:
        from sparkdedup.tuning import tune_worker_memory

        tune_worker_memory()
        out = []
        for t, o in zip(texts, offs):
            if o is None or len(o) == 0:
                out.append(t)
            else:
                out.append(splice_out(t, list(o), cfg.k))
        return pd.Series(out)

    return splice


@dataclass
class SubstringMetrics:
    rows_before: int = 0
    duplicated_windows: int = 0
    rows_after: int = 0


@dataclass
class SubstringResult:
    kept: DataFrame
    metrics: SubstringMetrics


def substring_dedup(
    df: DataFrame,
    cfg: SubstringConfig = SubstringConfig(),
    id_col: str = DOC_ID,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    collect_metrics: bool = True,
) -> SubstringResult:
    """Remove every byte range (length >= k) whose content appears more
    than once in the corpus; drop emptied docs."""
    from sparkdedup.io import ensure_parallelism

    metrics = SubstringMetrics()
    df = ensure_parallelism(df).persist(storage_level)
    if collect_metrics:
        metrics.rows_before = df.count()

    win_udf = make_window_udf(cfg)
    wins = (
        df.select(F.col(id_col), F.explode(win_udf(F.col(cfg.column))).alias("w"))
        .select(F.col(id_col), F.col("w.h1"), F.col("w.h2"), F.col("w.off"))
    )
    dup_keys = (
        wins.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1).drop("c")
    )
    dup_wins = wins.join(dup_keys, on=["h1", "h2"])
    per_doc = dup_wins.groupBy(id_col).agg(F.sort_array(F.collect_list("off")).alias("__offs__"))
    if collect_metrics:
        metrics.duplicated_windows = dup_wins.count()

    splice_udf = make_splice_udf(cfg)
    kept = (
        df.join(per_doc, on=id_col, how="left")
        .withColumn(
            cfg.column,
            F.when(F.col("__offs__").isNull(), F.col(cfg.column)).otherwise(
                splice_udf(F.col(cfg.column), F.col("__offs__"))
            ),
        )
        .drop("__offs__")
        .filter(F.length(F.col(cfg.column)) > 0)
    )
    if collect_metrics:
        metrics.rows_after = kept.count()
    return SubstringResult(kept, metrics)
