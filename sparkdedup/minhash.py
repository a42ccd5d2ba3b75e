"""MinHash-LSH near-duplicate detection — the flagship pipeline.

Semantics: identical signature math to the reference Spark variant
(/root/reference/text_dedup/minhash_spark.py): word n-gram shingles →
xxh32 → uint32 universal-hash permutations with wrap-around arithmetic
``((h*a + b) mod 4294967291) & 0xFFFFFFFF`` (minhash_spark.py:222-226)
→ per-band byte signatures → band collision groups → star edges to the
group minimum (minhash_spark.py:40-64) → connected components → keep
the component-minimum row (minhash_spark.py:524-528).

Architecture (Spark-first, NOT a port):
  * signatures: one Arrow-batched pandas UDF, NumPy-vectorized across
    the whole batch (chunked ``np.minimum.reduceat`` over concatenated
    shingle arrays) — replaces the reference's per-row rdd.flatMap.
  * banding: JVM-side ``posexplode`` of the array<binary> signature.
  * candidate edges: pre-aggregated group-min + join back, NOT
    groupBy().collect_list: map-side partial aggregation means a
    mega-cluster band key costs a combine, not a single-task list
    build; singleton band groups (the overwhelming majority) are pruned
    by ``count > 1`` BEFORE the join, so AQE can broadcast the
    collision table when it is small and skew-split the join when not.
  * clustering: checkpointed label propagation (sparkdedup.cc), no
    GraphFrames.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType

from sparkdedup.cc import connected_components
from sparkdedup.config import MAX_HASH_32, MOD_PRIME_32, MinHashConfig
from sparkdedup.hashing import generate_permutations
from sparkdedup.io import DOC_ID
from sparkdedup.shingle import word_shingle_hashes_batch

# hash_bits -> (dtype, max_hash, modulo_prime); mirrors the reference
# HASH_CONFIG (minhash.py:289-296): 64-bit is the legacy-datasketch mode
# (32-bit hash data under the Mersenne prime 2^61-1 in uint64
# arithmetic), 32/16-bit use near-2^n primes. The base shingle hash is
# our pinned xxh32 (masked to 16 bits for the 16-bit mode).
_HASH_CONFIG = {
    64: (np.uint64, np.uint64((1 << 32) - 1), np.uint64((1 << 61) - 1)),
    32: (np.uint32, np.uint32((1 << 32) - 1), np.uint32((1 << 32) - 5)),
    16: (np.uint16, np.uint16((1 << 16) - 1), np.uint16((1 << 16) - 15)),
}

# Max shingles per vectorized permute chunk. Small on purpose: the
# (CHUNK, num_perm) uint32 permute matrix (1024*250*4 = 1 MB) must stay
# L2-resident PER WORKER — with 32 concurrent executor pythons the
# workload is memory-bandwidth-bound, and 1 MB chunks + in-place ops
# measured ~15x faster than 8 MB chunks under full concurrency.
_PERMUTE_CHUNK = 1_024

SIG = "__sig__"
COMPONENT = "__component__"


@dataclass
class MinHashMetrics:
    rows_before: int = 0
    rows_kept_len_filter: int = 0
    candidate_edges: int = 0
    cc_iterations: int = 0
    rows_after: int = 0
    stage_seconds: Dict[str, float] = field(default_factory=dict)


def _sha1_shingle_hashes(texts: List[str], cfg: MinHashConfig) -> List[Optional[np.ndarray]]:
    """sha1 base-hash path (reference non-Spark default,
    minhash.py:301-305: sha1_hash(token, d=min(hash_bits, 32))).
    Per-shingle hashlib calls — a parity option, not the hot path."""
    from sparkdedup.hashing import sha1_hash
    from sparkdedup.shingle import word_shingles

    d = min(cfg.hash_bits, 32)
    out: List[Optional[np.ndarray]] = []
    for text in texts:
        if text is None:
            out.append(None)
            continue
        shingles = word_shingles(text, cfg.ngram, cfg.min_length)
        if shingles is None:
            out.append(None)
            continue
        out.append(np.unique(np.array([sha1_hash(s, d) for s in shingles], dtype=np.uint32)))
    return out


def compute_band_signatures(
    texts: List[str],
    cfg: MinHashConfig,
) -> List[Optional[List[bytes]]]:
    """Pure-Python/NumPy core: per doc, the B band byte-signatures
    (None when the doc has < min_length tokens).

    This is the function the golden tests pin against the NumPy oracle;
    the pandas UDF below is just its Arrow wrapper.
    """
    b, r = cfg.resolved_bands()
    dtype, max_hash, prime = _HASH_CONFIG[cfg.hash_bits]
    a_coef, b_coef = generate_permutations(cfg.num_perm, int(prime), cfg.seed, dtype=dtype)

    if cfg.base_hash == "sha1":
        per_doc = _sha1_shingle_hashes(texts, cfg)
    else:
        per_doc = word_shingle_hashes_batch(texts, cfg.ngram, cfg.min_length)
    if cfg.hash_bits == 16:
        per_doc = [None if h is None else (h & np.uint32(0xFFFF)).astype(np.uint16) for h in per_doc]
    elif cfg.hash_bits == 64:
        per_doc = [None if h is None else h.astype(np.uint64) for h in per_doc]
    out: List[Optional[List[bytes]]] = [None] * len(texts)

    # chunk whole docs so each permute matrix stays bounded
    chunk_idx: List[int] = []
    chunk_counts: List[int] = []
    chunk_hashes: List[np.ndarray] = []
    budget = 0

    def flush() -> None:
        nonlocal budget
        if not chunk_idx:
            return
        h = np.concatenate(chunk_hashes).astype(dtype, copy=False)
        with np.errstate(over="ignore"):
            # uint32 wrap-around BEFORE the modulus — the reference
            # relies on this exact overflow behavior (minhash.py:122).
            # In-place ops: one materialized matrix, not four.
            ph = h[:, None] * a_coef[None, :]
            ph += b_coef[None, :]
            ph %= prime
            ph &= max_hash
        starts = np.concatenate(([0], np.cumsum(chunk_counts)[:-1]))
        mins = np.minimum.reduceat(ph, starts, axis=0)
        for row, doc_i in enumerate(chunk_idx):
            sig = mins[row]
            out[doc_i] = [sig[band * r : (band + 1) * r].tobytes() for band in range(b)]
        chunk_idx.clear()
        chunk_counts.clear()
        chunk_hashes.clear()
        budget = 0

    def oversized_minima(hashes: np.ndarray) -> np.ndarray:
        # a single huge doc (minified/generated source) must NOT
        # materialize an (n_shingles, num_perm) matrix: permute in
        # fixed slices and fold partial minima, so peak memory is
        # O(_PERMUTE_CHUNK * num_perm) regardless of doc size.
        mins = np.full(cfg.num_perm, max_hash, dtype=dtype)
        for s in range(0, hashes.size, _PERMUTE_CHUNK):
            h = hashes[s : s + _PERMUTE_CHUNK].astype(dtype, copy=False)
            with np.errstate(over="ignore"):
                ph = h[:, None] * a_coef[None, :]
                ph += b_coef[None, :]
                ph %= prime
                ph &= max_hash
            np.minimum(mins, ph.min(axis=0), out=mins)
        return mins

    for i, hashes in enumerate(per_doc):
        if hashes is None:
            continue
        if hashes.size == 0:
            # len(tokens) >= min_length guarantees >= 1 shingle, but be safe
            out[i] = [np.full(r, max_hash, dtype=dtype).tobytes()] * b
            continue
        if hashes.size >= _PERMUTE_CHUNK:
            sig = oversized_minima(hashes)
            out[i] = [sig[band * r : (band + 1) * r].tobytes() for band in range(b)]
            continue
        chunk_idx.append(i)
        chunk_counts.append(hashes.size)
        chunk_hashes.append(hashes)
        budget += hashes.size
        if budget >= _PERMUTE_CHUNK:
            flush()
    flush()
    return out


def make_signature_udf(cfg: MinHashConfig):
    """Arrow-batched UDF: content -> array<binary> of B band signatures
    (null = below min_length, i.e. the reference's length filter,
    minhash_spark.py:423-425)."""

    @pandas_udf(ArrayType(BinaryType()))
    def signature(texts: pd.Series) -> pd.Series:
        from sparkdedup.tuning import tune_worker_memory

        tune_worker_memory()
        return pd.Series(compute_band_signatures(texts.tolist(), cfg))

    return signature


def minhash_bands(df: DataFrame, cfg: MinHashConfig, id_col: str = DOC_ID) -> DataFrame:
    """Exploded band table: (id, band, hash: binary)."""
    sig_udf = make_signature_udf(cfg)
    return (
        df.select(F.col(id_col), sig_udf(F.col(cfg.column)).alias(SIG))
        .filter(F.col(SIG).isNotNull())
        .select(F.col(id_col), F.posexplode(SIG).alias("band", "hash"))
    )


def band_edges(bands: DataFrame, id_col: str = DOC_ID) -> DataFrame:
    """Star edges (src -> band-group minimum), skew-safe.

    Two-phase plan: (1) groupBy(band, hash) min/count with map-side
    combine — no per-key row materialization, immune to mega-cluster
    keys; (2) prune singleton groups, then join the collision minima
    back. AQE broadcasts the (usually tiny) collision table or splits
    skewed probe partitions.
    """
    # 128-bit two-long key instead of the raw (band, 40-byte binary)
    # pair: binary grouping keys measured ~4x slower in HashAggregate,
    # and a single 64-bit key would produce ~1e7 false merges at
    # 10^12-doc scale; two independent 64-bit hashes (2^-128/pair) are
    # collision-safe at any realistic corpus size.
    keyed = bands.select(
        F.col(id_col),
        F.xxhash64("band", "hash").alias("k1"),
        F.xxhash64("hash", F.lit(0x9E3779B9), "band").alias("k2"),
    )
    mins = (
        keyed.groupBy("k1", "k2")
        .agg(F.min(id_col).alias("dst"), F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .drop("cnt")
    )
    return (
        keyed.join(mins, on=["k1", "k2"])
        .filter(F.col(id_col) != F.col("dst"))
        .select(F.col(id_col).alias("src"), F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


@dataclass
class MinHashResult:
    kept: DataFrame  # surviving rows (original schema + __id__)
    assignment: DataFrame  # (id, component) for every edge-touched doc
    metrics: MinHashMetrics
    cached: List[DataFrame] = field(default_factory=list)

    def release(self) -> None:
        """Unpersist pipeline-cached DataFrames. Call once the outputs
        are written/consumed; materializing them afterwards recomputes."""
        for df in self.cached:
            df.unpersist()
        self.cached.clear()


def minhash_dedup(
    df: DataFrame,
    cfg: MinHashConfig = MinHashConfig(),
    id_col: str = DOC_ID,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    collect_metrics: bool = True,
) -> MinHashResult:
    """End-to-end MinHash-LSH dedup.

    ``df`` must already carry a stable long id column (``io.with_doc_id``
    + persist if synthesized). Returns surviving rows: docs below
    min_length are dropped; of each near-dup component the minimum-id
    row survives (minhash_spark.py:423-428, 524-528).

    collect_metrics=False skips the stage-count actions (each is a full
    pass) — the fast path for production/bench runs; no isEmpty probe
    either: the edge list flows straight into connected_components,
    whose driver path collects it in ONE job and reports the exact edge
    count back (CCStats.n_edges), so the empty-graph early exit costs
    nothing extra.
    """
    import time

    from sparkdedup.io import ensure_parallelism

    metrics = MinHashMetrics()
    t0 = time.time()

    df = ensure_parallelism(df)
    with_sig = df.withColumn(SIG, make_signature_udf(cfg)(F.col(cfg.column)))
    # storage_level=None: recompute signatures per consumer instead of
    # caching — wins when the cached (text + signatures) working set
    # would spill to disk (cache serialization + spill I/O + GC can cost
    # more than one extra CPU pass at high core counts).
    # SHARPER CONTRACT on this path: ``df``'s lineage must be
    # deterministic end-to-end (a real scan/table plus a stable id
    # column). An UNPERSISTED monotonically_increasing_id lineage is
    # corrupting here: the edge pass and the kept join would each
    # recompute ids independently and can disagree. Callers that
    # synthesize ids MUST materialize them (pipeline._stage_ids writes
    # an ids parquet) before choosing storage_level=None.
    if storage_level is not None:
        with_sig = with_sig.persist(storage_level)
    kept_docs = with_sig.filter(F.col(SIG).isNotNull())
    if collect_metrics:
        metrics.rows_before = df.count()
        metrics.rows_kept_len_filter = kept_docs.count()
    metrics.stage_seconds["signatures"] = time.time() - t0

    t1 = time.time()
    bands = kept_docs.select(F.col(id_col), F.posexplode(SIG).alias("band", "hash"))
    edges = band_edges(bands, id_col)
    if collect_metrics:
        # metrics need an explicit edge count; persist so the count and
        # the CC pass share one materialization
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
        metrics.candidate_edges = edges.count()
        no_edges = metrics.candidate_edges == 0
    else:
        # fast path: edges stay lazy — connected_components' driver
        # path consumes the lineage exactly once (single collect job)
        # and reports n_edges, covering the empty-graph check for free
        no_edges = False
    metrics.stage_seconds["edges"] = time.time() - t1

    t2 = time.time()
    if not no_edges:
        assignment, cc_stats = connected_components(edges)
        metrics.cc_iterations = cc_stats.iterations
        no_edges = cc_stats.n_edges == 0

    if no_edges:
        # early exit mirrors minhash_spark.py:472-483; the empty
        # assignment is built lineage-free so edges can be unpersisted
        empty_assign = df.sparkSession.createDataFrame([], "id long, component long")
        if collect_metrics:
            edges.unpersist()
        result = kept_docs.drop(SIG)
        metrics.rows_after = metrics.rows_kept_len_filter
        metrics.stage_seconds["cc"] = time.time() - t2
        return MinHashResult(
            result, empty_assign, metrics,
            cached=[with_sig] if storage_level is not None else [],
        )
    metrics.stage_seconds["cc"] = time.time() - t2

    t3 = time.time()
    kept = (
        kept_docs.join(
            assignment.withColumnRenamed("id", id_col).withColumnRenamed("component", COMPONENT),
            on=id_col,
            how="left",
        )
        .filter(F.col(COMPONENT).isNull() | (F.col(COMPONENT) == F.col(id_col)))
        .drop(COMPONENT, SIG)
    )
    if collect_metrics:
        metrics.rows_after = kept.count()
        edges.unpersist()
    metrics.stage_seconds["filter"] = time.time() - t3
    return MinHashResult(
        kept, assignment, metrics,
        cached=[with_sig] if storage_level is not None else [],
    )
