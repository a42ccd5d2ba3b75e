"""SimHash near-duplicate detection.

Reference semantics (/root/reference/text_dedup/simhash.py): char
n-gram shingles → per-shingle 64-bit hash → bit-majority fingerprint
(`compute`, simhash.py:273-301) → block-permutation bucket keys
(Permutation/_create_permutations, simhash.py:69-240: f bits split into
`num_bucket` blocks; one permutation per choice of (b-k) leading
blocks; bucket key = (search_mask, permuted_fp & mask)) → within-bucket
pairs with Hamming distance <= bit_diff are unioned (simhash.py:408-434).

Spark-first design:
  * fingerprints: ONE pandas UDF — all shingles of the Arrow batch are
    hashed in a single vectorized xxh64 call, bit counts via
    np.add.reduceat over the concatenated (S, 64) bit matrix. (The
    reference's xxh3 is unavailable here; the hash only needs to be
    consistent — simhash.py:249 — and both test oracle and pipeline
    share the pinned vendored xxh64.)
  * bucket keys: JVM-side bit arithmetic (shiftrightunsigned/&/|) from
    driver-precomputed block layouts — no second UDF pass. A key is
    (mask_width, leading-blocks value), exactly the reference's
    (search_mask, masked permuted fp) since the mask is determined by
    its width.
  * mega-cluster skew: identical fingerprints are collapsed to one
    representative BEFORE the bucket self-join (star edges cover the
    rest), so the quadratic within-bucket pair check runs on distinct
    fingerprints only.
  * Hamming verify: built-in ``bit_count(a ^ b) <= k`` (codegen).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import permutations as iter_permutations
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType

from sparkdedup.cc import connected_components
from sparkdedup.config import SimHashConfig
from sparkdedup.io import DOC_ID
from sparkdedup.shingle import char_shingle_hashes64_batch

FP = "__fp__"
COMPONENT = "__component__"


# --- block/permutation layout (driver-side, plain ints) ------------------


def block_layout(f: int, b: int) -> List[Tuple[int, int]]:
    """(width, start_bit) per block.

    Replicates the reference's actual layout loop
    (_create_permutations, simhash.py:213-230): repeated ceil(f/b)-wide
    blocks, the last truncated at f (the min/max solver result is
    computed there but never applied — `x` is not decremented), so e.g.
    f=64,b=3 gives widths [22,22,20]."""
    import math

    max_w = math.ceil(f / b)
    blocks = []
    start = 0
    for _ in range(b):
        if start >= f:
            break
        w = min(max_w, f - start)
        blocks.append((w, start))
        start += w
    assert sum(w for w, _ in blocks) == f
    return blocks


def permutation_keys(f: int, k: int, b: int) -> List[Tuple[int, List[Tuple[int, int]]]]:
    """One entry per permutation: (mask_width, [(width, start_bit), ...]
    of its leading b-k blocks in order)."""
    blocks = block_layout(f, b)
    out = []
    for leading in iter_permutations(range(len(blocks)), b - k):
        chosen = [blocks[i] for i in leading]
        out.append((sum(w for w, _ in chosen), chosen))
    return out


def bucket_key_columns(fp_col: Column, f: int, k: int, b: int) -> List[Column]:
    """For each permutation, a struct(mask_width, key) column computed
    with JVM bit ops. Bit i of the fingerprint = bit (f-1-i) of the
    stored long (MSB-first, matching the bitarray convention)."""
    cols = []
    for mask_width, chosen in permutation_keys(f, k, b):
        key = F.lit(0).cast("long")
        consumed = 0
        for width, start in chosen:
            consumed += width
            # block value = bits [start, start+width) counted MSB-first
            block_val = F.shiftrightunsigned(fp_col, f - start - width).bitwiseAND(
                F.lit((1 << width) - 1).cast("long")
            )
            key = key.bitwiseOR(F.shiftleft(block_val, mask_width - consumed))
        cols.append(F.struct(F.lit(mask_width).alias("mask"), key.alias("key")))
    return cols


# --- fingerprint UDF -----------------------------------------------------


def compute_fingerprints(texts: List[str], cfg: SimHashConfig) -> List[Optional[int]]:
    """Bit-majority SimHash fingerprints for a batch (None = too short).

    Majority rule matches the reference: bit set iff
    sum(2*bit - 1) > 0 over shingles (ties -> 0, simhash.py:297-298).
    """
    per_doc = char_shingle_hashes64_batch(texts, cfg.ngram, cfg.min_length)
    idx = [i for i, h in enumerate(per_doc) if h is not None]
    out: List[Optional[int]] = [None] * len(texts)
    if not idx:
        return out
    counts = np.array([per_doc[i].size for i in idx])
    allh = np.concatenate([per_doc[i] for i in idx])
    # MSB-first (f-1 .. 0) bit matrix via byteswap+unpackbits — ~7x
    # faster than per-bit shifts; add.reduceat sums per doc.
    bits = np.unpackbits(allh.byteswap().view(np.uint8).reshape(-1, cfg.f // 8), axis=1)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)  # (docs, f)
    maj = (2 * ones - counts[:, None]) > 0
    shifts = np.arange(cfg.f - 1, -1, -1, dtype=np.uint64)
    weights = (np.uint64(1) << shifts).astype(np.uint64)
    fps = (maj.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64).view(np.int64)
    for row, doc_i in enumerate(idx):
        out[doc_i] = int(fps[row])
    return out


def make_fingerprint_udf(cfg: SimHashConfig):
    @pandas_udf(LongType())
    def fingerprint(texts: pd.Series) -> pd.Series:
        from sparkdedup.tuning import tune_worker_memory

        tune_worker_memory()
        return pd.Series(compute_fingerprints(texts.tolist(), cfg), dtype="object")

    return fingerprint


# --- pipeline ------------------------------------------------------------


@dataclass
class SimHashMetrics:
    rows_before: int = 0
    rows_with_fp: int = 0
    distinct_fps: int = 0
    candidate_edges: int = 0
    cc_iterations: int = 0
    rows_after: int = 0


@dataclass
class SimHashResult:
    kept: DataFrame
    assignment: DataFrame
    metrics: SimHashMetrics


def simhash_edges(fps: DataFrame, cfg: SimHashConfig, id_col: str = DOC_ID) -> DataFrame:
    """Edges between docs with bucket-key collision AND Hamming <= k.

    fps: DataFrame[id_col, __fp__ (long, non-null)].
    """
    # 1) collapse identical fingerprints: star edges to the min id
    reps = fps.groupBy(FP).agg(F.min(id_col).alias("rep"), F.count(F.lit(1)).alias("cnt"))
    zero_edges = (
        fps.join(reps.filter(F.col("cnt") > 1).drop("cnt"), on=FP)
        .filter(F.col(id_col) != F.col("rep"))
        .select(F.col(id_col).alias("src"), F.col("rep").alias("dst"))
    )

    # 2) bucket join over DISTINCT fingerprints only
    distinct = reps.select("rep", FP)
    keys = bucket_key_columns(F.col(FP), cfg.f, cfg.bit_diff, cfg.num_bucket)
    bucketed = distinct.select(
        "rep", FP, F.explode(F.array(*keys)).alias("bk")
    ).select("rep", FP, F.col("bk.mask").alias("mask"), F.col("bk.key").alias("key"))
    a = bucketed.alias("a")
    b = (
        bucketed.withColumnRenamed("rep", "rep_b").withColumnRenamed(FP, "__fp_b__").alias("b")
    )
    pair_edges = (
        a.join(b, on=["mask", "key"])
        .filter(F.col("rep") < F.col("rep_b"))
        .select("rep", "rep_b", FP, "__fp_b__")
        .dropDuplicates(["rep", "rep_b"])
        .filter(F.bit_count(F.col(FP).bitwiseXOR(F.col("__fp_b__"))) <= cfg.bit_diff)
        .select(F.col("rep_b").alias("src"), F.col("rep").alias("dst"))
    )
    return zero_edges.unionByName(pair_edges).dropDuplicates(["src", "dst"])


def simhash_dedup(
    df: DataFrame,
    cfg: SimHashConfig = SimHashConfig(),
    id_col: str = DOC_ID,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    collect_metrics: bool = True,
) -> SimHashResult:
    """End-to-end SimHash dedup; min-id representative of each cluster
    survives (cluster==index filter, simhash.py:447-452). Docs too
    short to fingerprint are kept as unique."""
    from sparkdedup.io import ensure_parallelism

    metrics = SimHashMetrics()
    fp_udf = make_fingerprint_udf(cfg)
    df = ensure_parallelism(df)
    with_fp = df.withColumn(FP, fp_udf(F.col(cfg.column))).persist(storage_level)
    fps = with_fp.filter(F.col(FP).isNotNull()).select(F.col(id_col), FP)
    if collect_metrics:
        metrics.rows_before = df.count()
        metrics.rows_with_fp = fps.count()

    edges = simhash_edges(fps, cfg, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    if collect_metrics:
        metrics.candidate_edges = edges.count()
        no_edges = metrics.candidate_edges == 0
    else:
        no_edges = edges.isEmpty()

    if no_edges:
        metrics.rows_after = metrics.rows_before
        return SimHashResult(with_fp.drop(FP), edges.select(F.col("src").alias("id"), F.col("dst").alias("component")), metrics)

    assignment, cc_stats = connected_components(edges)
    metrics.cc_iterations = cc_stats.iterations

    kept = (
        with_fp.join(
            assignment.withColumnRenamed("id", id_col).withColumnRenamed("component", COMPONENT),
            on=id_col,
            how="left",
        )
        .filter(F.col(COMPONENT).isNull() | (F.col(COMPONENT) == F.col(id_col)))
        .drop(COMPONENT, FP)
    )
    if collect_metrics:
        metrics.rows_after = kept.count()
    edges.unpersist()
    return SimHashResult(kept, assignment, metrics)
