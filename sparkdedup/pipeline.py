"""End-to-end job drivers: stage-checkpointed, resumable, metrics out.

North-rule requirements (BASELINE.json): resumable from checkpoint with
per-partition lineage + metrics. Design:

  * every expensive intermediate (ids+signatures implicit via
    deterministic recompute, candidate EDGES, the CC ASSIGNMENT) is
    materialized as parquet under ``work_dir`` with Spark's atomic
    _SUCCESS markers;
  * on restart the driver scans work_dir and resumes AFTER the last
    complete stage — a killed CC run restarts from the saved edges, a
    killed write restarts from the saved assignment; nothing re-reads
    the raw corpus except the final join;
  * per-stage wall times + row counts + per-partition output row
    counts are written as one metrics JSON artifact.

The CC loop itself additionally localCheckpoints every round
(sparkdedup.cc), bounding recomputation within the stage.
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import asdict, dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdedup.cc import connected_components
from sparkdedup.config import CCNetConfig, MinHashConfig, SimHashConfig, SubstringConfig
from sparkdedup.io import DOC_ID, partitioned_save, read_documents, with_doc_id
from sparkdedup.minhash import COMPONENT, SIG, band_edges, make_signature_udf


@dataclass
class StageInfo:
    seconds: float = 0.0
    rows: int = -1
    resumed: bool = False


@dataclass
class RunMetrics:
    mode: str = "minhash"
    stages: Dict[str, StageInfo] = field(default_factory=dict)
    partition_rows: Dict[str, int] = field(default_factory=dict)
    rows_before: int = -1
    rows_after: int = -1


def _complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def sample_clusters(
    docs: DataFrame,
    assignment: DataFrame,
    n_clusters: int = 10,
    id_col: str = DOC_ID,
    seed: int = 42,
) -> DataFrame:
    """Debug sampler: a few non-trivial clusters with their member rows
    (reference utils/inspect.py:9-25)."""
    sizes = assignment.groupBy("component").count().filter(F.col("count") > 1)
    picked = sizes.orderBy(F.xxhash64(F.col("component") + seed)).limit(n_clusters)
    members = assignment.join(picked.select("component"), on="component")
    return docs.join(
        members.withColumnRenamed("id", id_col), on=id_col
    ).orderBy("component", id_col)


def minhash_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    work_dir: str,
    cfg: MinHashConfig = MinHashConfig(),
    id_column: Optional[str] = None,
    metrics_path: Optional[str] = None,
) -> RunMetrics:
    """Resumable MinHash-LSH dedup: input table -> deduped output table
    + assignment artifact + metrics JSON."""
    m = RunMetrics(mode="minhash")
    os.makedirs(work_dir, exist_ok=True)
    ids_path = os.path.join(work_dir, "ids.parquet")
    edges_path = os.path.join(work_dir, "edges.parquet")
    assign_path = os.path.join(work_dir, "assignment.parquet")

    # --- stage: id assignment (materialized: monotonically_increasing_id
    # is NOT stable across recomputation — reference persists for the
    # same reason, minhash_spark.py:419-430)
    t = time.time()
    if _complete(ids_path):
        ids_df = spark.read.parquet(ids_path)
        m.stages["ids"] = StageInfo(time.time() - t, resumed=True)
    else:
        from sparkdedup.io import ensure_parallelism

        df = ensure_parallelism(read_documents(spark, input_path))
        ids_df = with_doc_id(df, id_column)
        ids_df.write.parquet(ids_path, mode="overwrite")
        ids_df = spark.read.parquet(ids_path)
        m.stages["ids"] = StageInfo(time.time() - t)
    m.rows_before = _checked_count(ids_df, id_column)

    # --- stage: signatures -> kept ids (length filter) + edges
    t = time.time()
    kept_ids_path = os.path.join(work_dir, "kept_ids.parquet")
    if _complete(edges_path) and _complete(kept_ids_path):
        edges = spark.read.parquet(edges_path)
        m.stages["edges"] = StageInfo(time.time() - t, resumed=True)
    else:
        from pyspark import StorageLevel

        sig_udf = make_signature_udf(cfg)
        with_sig = (
            ids_df.select(F.col(DOC_ID), sig_udf(F.col(cfg.column)).alias(SIG))
            .filter(F.col(SIG).isNotNull())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        with_sig.select(DOC_ID).write.parquet(kept_ids_path, mode="overwrite")
        bands = with_sig.select(F.col(DOC_ID), F.posexplode(SIG).alias("band", "hash"))
        band_edges(bands).write.parquet(edges_path, mode="overwrite")
        with_sig.unpersist()
        edges = spark.read.parquet(edges_path)
        m.stages["edges"] = StageInfo(time.time() - t)
    m.stages["edges"].rows = edges.count()

    # --- stage: connected components
    t = time.time()
    if _complete(assign_path):
        assignment = spark.read.parquet(assign_path)
        m.stages["cc"] = StageInfo(time.time() - t, resumed=True)
    else:
        assignment, _ = connected_components(edges)
        assignment.write.parquet(assign_path, mode="overwrite")
        assignment = spark.read.parquet(assign_path)
        m.stages["cc"] = StageInfo(time.time() - t)
    m.stages["cc"].rows = assignment.count()

    # --- stage: length filter (precomputed ids) + representative filter + write
    t = time.time()
    kept_ids = spark.read.parquet(kept_ids_path)
    kept = (
        ids_df.join(kept_ids, on=DOC_ID, how="leftsemi")
        .join(
            assignment.withColumnRenamed("id", DOC_ID).withColumnRenamed("component", COMPONENT),
            on=DOC_ID,
            how="left",
        )
        .filter(F.col(COMPONENT).isNull() | (F.col(COMPONENT) == F.col(DOC_ID)))
        .drop(COMPONENT)
    )
    partitioned_save(kept, output_path)
    m.stages["write"] = StageInfo(time.time() - t)

    out = spark.read.parquet(output_path)
    m.rows_after = out.count()
    pid_rows = out.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    m.partition_rows = {str(r["pid"]): r["count"] for r in pid_rows}

    _write_metrics(m, metrics_path)
    return m


def _write_metrics(m: RunMetrics, metrics_path: Optional[str]) -> None:
    if not metrics_path:
        return
    with open(metrics_path, "w") as f:
        json.dump(
            {
                "mode": m.mode,
                "rows_before": m.rows_before,
                "rows_after": m.rows_after,
                "stages": {k: asdict(v) for k, v in m.stages.items()},
                "partition_rows": m.partition_rows,
            },
            f,
            indent=2,
        )


def _stage_ids(
    spark: SparkSession, input_path: str, work_dir: str, id_column: Optional[str], m: RunMetrics
) -> DataFrame:
    """Shared first stage: materialized stable ids (mii is not stable
    across recomputation — must be staged before anything joins on it)."""
    ids_path = os.path.join(work_dir, "ids.parquet")
    t = time.time()
    if _complete(ids_path):
        m.stages["ids"] = StageInfo(time.time() - t, resumed=True)
    else:
        from sparkdedup.io import ensure_parallelism

        df = ensure_parallelism(read_documents(spark, input_path))
        with_doc_id(df, id_column).write.parquet(ids_path, mode="overwrite")
        m.stages["ids"] = StageInfo(time.time() - t)
    ids_df = spark.read.parquet(ids_path)
    m.rows_before = _checked_count(ids_df, id_column)
    return ids_df


def _checked_count(ids_df: DataFrame, id_column: Optional[str]) -> int:
    """Row count; for derived ids (string keys -> xxhash64) also assert
    uniqueness in the same aggregation — a 64-bit collision would
    silently merge two docs and drop one, so fail loudly instead."""
    if id_column is None:
        return ids_df.count()
    stats = ids_df.agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct(F.col(DOC_ID)).alias("d")
    ).first()
    if stats["n"] != stats["d"]:
        # failure path only: one extra tiny job to make the abort
        # actionable — show which user keys collide
        sample = (
            ids_df.groupBy(DOC_ID)
            .agg(F.count(F.lit(1)).alias("c"), F.collect_set(F.col(id_column)).alias("keys"))
            .filter(F.col("c") > 1)
            .limit(5)
            .collect()
        )
        shown = "; ".join(str(sorted(r["keys"]))[:120] for r in sample)
        raise ValueError(
            f"id column {id_column!r} maps to {stats['n'] - stats['d']} colliding "
            f"__id__ values (hash collision or duplicate keys), e.g. {shown}; "
            f"deduplicate the key column or drop --index to synthesize ids"
        )
    return int(stats["n"])


def _finalize(
    spark: SparkSession, kept: DataFrame, output_path: str, m: RunMetrics,
    metrics_path: Optional[str], t: float,
) -> RunMetrics:
    partitioned_save(kept, output_path)
    m.stages["write"] = StageInfo(time.time() - t)
    out = spark.read.parquet(output_path)
    m.rows_after = out.count()
    pid_rows = out.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    m.partition_rows = {str(r["pid"]): r["count"] for r in pid_rows}
    _write_metrics(m, metrics_path)
    return m


def simhash_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    work_dir: str,
    cfg: SimHashConfig = SimHashConfig(),
    id_column: Optional[str] = None,
    metrics_path: Optional[str] = None,
) -> RunMetrics:
    """Resumable SimHash dedup: ids -> fingerprints -> edges ->
    assignment -> representative write. Docs too short to fingerprint
    are kept as unique (simhash_dedup semantics)."""
    from sparkdedup.simhash import FP, _fp_not_null, make_fingerprint_udf, simhash_edges

    m = RunMetrics(mode="simhash")
    os.makedirs(work_dir, exist_ok=True)
    fps_path = os.path.join(work_dir, "fps.parquet")
    edges_path = os.path.join(work_dir, "edges.parquet")
    assign_path = os.path.join(work_dir, "assignment.parquet")

    ids_df = _stage_ids(spark, input_path, work_dir, id_column, m)

    t = time.time()
    if _complete(fps_path):
        m.stages["fps"] = StageInfo(time.time() - t, resumed=True)
    else:
        fp_udf = make_fingerprint_udf(cfg)
        (
            ids_df.select(F.col(DOC_ID), fp_udf(F.col(cfg.column)).alias(FP))
            .filter(_fp_not_null(cfg))
            .write.parquet(fps_path, mode="overwrite")
        )
        m.stages["fps"] = StageInfo(time.time() - t)
    fps = spark.read.parquet(fps_path)
    m.stages["fps"].rows = fps.count()

    t = time.time()
    if _complete(edges_path):
        m.stages["edges"] = StageInfo(time.time() - t, resumed=True)
    else:
        simhash_edges(fps, cfg, DOC_ID).write.parquet(edges_path, mode="overwrite")
        m.stages["edges"] = StageInfo(time.time() - t)
    edges = spark.read.parquet(edges_path)
    m.stages["edges"].rows = edges.count()

    t = time.time()
    if _complete(assign_path):
        m.stages["cc"] = StageInfo(time.time() - t, resumed=True)
    else:
        assignment, _ = connected_components(edges)
        assignment.write.parquet(assign_path, mode="overwrite")
        m.stages["cc"] = StageInfo(time.time() - t)
    assignment = spark.read.parquet(assign_path)
    m.stages["cc"].rows = assignment.count()

    t = time.time()
    kept = (
        ids_df.join(
            assignment.withColumnRenamed("id", DOC_ID).withColumnRenamed("component", COMPONENT),
            on=DOC_ID,
            how="left",
        )
        .filter(F.col(COMPONENT).isNull() | (F.col(COMPONENT) == F.col(DOC_ID)))
        .drop(COMPONENT)
    )
    return _finalize(spark, kept, output_path, m, metrics_path, t)


def substring_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    work_dir: str,
    cfg: SubstringConfig = SubstringConfig(),
    id_column: Optional[str] = None,
    metrics_path: Optional[str] = None,
) -> RunMetrics:
    """Resumable exact-substring dedup: ids -> duplicated-fingerprint
    table (PASS A, the expensive global aggregation) -> splice + write.
    A killed splice restarts from the staged dup_keys parquet."""
    from sparkdedup.suffix import _detect_dup_keys, apply_substring_splice

    m = RunMetrics(mode="substring")
    os.makedirs(work_dir, exist_ok=True)
    dup_path = os.path.join(work_dir, "dup_keys.parquet")

    ids_df = _stage_ids(spark, input_path, work_dir, id_column, m)

    t = time.time()
    if _complete(dup_path):
        m.stages["dup_keys"] = StageInfo(time.time() - t, resumed=True)
    else:
        _detect_dup_keys(ids_df, cfg).write.parquet(dup_path, mode="overwrite")
        m.stages["dup_keys"] = StageInfo(time.time() - t)
    dup_keys = spark.read.parquet(dup_path)
    m.stages["dup_keys"].rows = dup_keys.count()

    t = time.time()
    kept, _path = apply_substring_splice(
        ids_df, dup_keys, cfg, DOC_ID, n_dup=m.stages["dup_keys"].rows
    )
    return _finalize(spark, kept, output_path, m, metrics_path, t)


def jaccard_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    work_dir: str,
    cfg: MinHashConfig = MinHashConfig(),
    id_column: Optional[str] = None,
    metrics_path: Optional[str] = None,
) -> RunMetrics:
    """Resumable Jaccard-verified dedup: ids -> (kept ids + verified
    edges) -> assignment -> representative write. Same stage layout as
    minhash_job with the exact-Jaccard verification folded into the
    edges stage."""
    from sparkdedup.jaccard import jaccard_verified_edges
    from sparkdedup.minhash import SIG, make_signature_udf

    m = RunMetrics(mode="jaccard")
    os.makedirs(work_dir, exist_ok=True)
    edges_path = os.path.join(work_dir, "edges.parquet")
    kept_ids_path = os.path.join(work_dir, "kept_ids.parquet")
    assign_path = os.path.join(work_dir, "assignment.parquet")

    ids_df = _stage_ids(spark, input_path, work_dir, id_column, m)

    t = time.time()
    if _complete(edges_path) and _complete(kept_ids_path):
        m.stages["edges"] = StageInfo(time.time() - t, resumed=True)
    else:
        from pyspark import StorageLevel

        sig_udf = make_signature_udf(cfg)
        with_sig = (
            ids_df.select(F.col(DOC_ID), F.col(cfg.column), sig_udf(F.col(cfg.column)).alias(SIG))
            .filter(F.col(SIG).isNotNull())
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        with_sig.select(DOC_ID).write.parquet(kept_ids_path, mode="overwrite")
        jaccard_verified_edges(with_sig, cfg, DOC_ID).write.parquet(
            edges_path, mode="overwrite"
        )
        with_sig.unpersist()
        m.stages["edges"] = StageInfo(time.time() - t)
    edges = spark.read.parquet(edges_path)
    m.stages["edges"].rows = edges.count()

    t = time.time()
    if _complete(assign_path):
        m.stages["cc"] = StageInfo(time.time() - t, resumed=True)
    else:
        assignment, _ = connected_components(edges)
        assignment.write.parquet(assign_path, mode="overwrite")
        m.stages["cc"] = StageInfo(time.time() - t)
    assignment = spark.read.parquet(assign_path)
    m.stages["cc"].rows = assignment.count()

    t = time.time()
    kept = (
        ids_df.join(spark.read.parquet(kept_ids_path), on=DOC_ID, how="leftsemi")
        .join(
            assignment.withColumnRenamed("id", DOC_ID).withColumnRenamed("component", COMPONENT),
            on=DOC_ID,
            how="left",
        )
        .filter(F.col(COMPONENT).isNull() | (F.col(COMPONENT) == F.col(DOC_ID)))
        .drop(COMPONENT)
    )
    return _finalize(spark, kept, output_path, m, metrics_path, t)


def ann_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    work_dir: str,
    threshold: float = 0.9,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    n_centroids: Optional[int] = None,
    n_probe: Optional[int] = None,
    k0: int = 20,
    metrics_path: Optional[str] = None,
    text_column: Optional[str] = None,
    encode_dim: int = 256,
    encode_ngram: int = 3,
) -> RunMetrics:
    """Resumable embedding near-dup dedup (reference ann_unisim mode):
    [encode ->] vectors -> adaptive-k match edges over the IVF index ->
    assignment -> representative write. A killed CC run resumes from
    the staged edges parquet; a killed write resumes from the
    assignment.

    ``text_column`` switches the input to a DOCUMENT table: docs are
    encoded to `encode_dim`-dim feature-hash embeddings
    (sparkdedup.encode — the reference embeds with an ONNX model,
    ann_unisim.py:75-99; the encoder is the pluggable part) and the
    encoded vectors are STAGED to work_dir parquet, so the expensive
    encode pass is never repeated on resume.

    ``n_centroids=None`` derives ~sqrt(N) IVF cells from the staged
    row count (ann.auto_n_centroids) — a fixed cell count makes the
    per-query candidate set a constant FRACTION of the corpus, i.e.
    quadratic total work at scale. In text mode ``id_column`` keeps its
    library default "vec_id" meaning "synthesize an id" (document
    tables don't carry vec_id); pass a real document id column to use
    it instead."""
    from sparkdedup.ann import ann_match_edges
    from sparkdedup.config import ANNConfig

    m = RunMetrics(mode="ann")
    os.makedirs(work_dir, exist_ok=True)
    edges_path = os.path.join(work_dir, "edges.parquet")
    assign_path = os.path.join(work_dir, "assignment.parquet")

    if text_column is not None:
        from sparkdedup.encode import encode_documents

        # the staged frame carries ALL doc columns + the embedding, so
        # (a) a synthesized id is assigned exactly once (mii is not
        # stable across re-reads) and (b) the final output is the
        # surviving DOCUMENTS, as in the reference's ann_unisim mode.
        # Docs with no shingles (below min_length) encode to NULL and
        # are dropped, mirroring the signature pipelines' length filter.
        vectors_path = os.path.join(work_dir, "vectors.parquet")
        t = time.time()
        if _complete(vectors_path):
            m.stages["encode"] = StageInfo(time.time() - t, resumed=True)
        else:
            # "vec_id" is the VECTOR-table default — document tables
            # don't have it; treat it as "synthesize" here
            doc_id_col = None if id_column in (None, "vec_id") else id_column
            raw_docs = read_documents(spark, input_path)
            if doc_id_col is None and "vec_id" in raw_docs.columns:
                # the synthesize reinterpretation would silently ignore
                # a REAL vec_id column the user may have meant to key on
                print(
                    "ann_job: text-mode input has a 'vec_id' column but "
                    "id_column='vec_id' is the library default meaning "
                    "'synthesize an id' — the existing column is IGNORED. "
                    "Pass a different --id_column name to key on a real column.",
                    file=sys.stderr,
                )
            docs = with_doc_id(raw_docs, doc_id_col)
            encoded = encode_documents(
                docs, column=text_column, output_column=vector_column,
                dim=encode_dim, ngram=encode_ngram,
            ).filter(F.col(vector_column).isNotNull())
            encoded.withColumnRenamed(DOC_ID, "vec_id").write.parquet(
                vectors_path, mode="overwrite"
            )
            m.stages["encode"] = StageInfo(time.time() - t)
        id_column = "vec_id"
        vectors = spark.read.parquet(vectors_path)
        m.stages["encode"].rows = vectors.count()
        m.rows_before = m.stages["encode"].rows
    else:
        vectors = read_documents(spark, input_path)
        m.rows_before = vectors.count()
    cfg = ANNConfig(id_column=id_column, vector_column=vector_column, threshold=threshold)
    probe = vectors.select(vector_column).filter(F.col(vector_column).isNotNull()).first()
    if probe is None:
        raise ValueError(
            f"ann_job: input {input_path!r} has no non-null {vector_column!r} rows "
            "(empty table, or every vector is NULL)"
        )
    dim = len(probe[0])

    t = time.time()
    if _complete(edges_path):
        m.stages["edges"] = StageInfo(time.time() - t, resumed=True)
    else:
        ann_match_edges(
            vectors, dim, cfg, exact=False, n_centroids=n_centroids,
            n_probe=n_probe, k0=k0,
        ).write.parquet(edges_path, mode="overwrite")
        m.stages["edges"] = StageInfo(time.time() - t)
    edges = spark.read.parquet(edges_path)
    m.stages["edges"].rows = edges.count()

    t = time.time()
    if _complete(assign_path):
        m.stages["cc"] = StageInfo(time.time() - t, resumed=True)
    else:
        assignment, _ = connected_components(edges)
        assignment.write.parquet(assign_path, mode="overwrite")
        m.stages["cc"] = StageInfo(time.time() - t)
    assignment = spark.read.parquet(assign_path)
    m.stages["cc"].rows = assignment.count()

    t = time.time()
    kept = (
        vectors.join(
            assignment.withColumnRenamed("id", id_column).withColumnRenamed(
                "component", COMPONENT
            ),
            on=id_column,
            how="left",
        )
        .filter(F.col(COMPONENT).isNull() | (F.col(COMPONENT) == F.col(id_column)))
        .drop(COMPONENT)
    )
    if text_column is not None:
        kept = kept.drop(vector_column)  # output = surviving documents
    return _finalize(spark, kept, output_path, m, metrics_path, t)


def ccnet_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    work_dir: str,
    cfg: CCNetConfig = CCNetConfig(),
    id_column: Optional[str] = None,
    metrics_path: Optional[str] = None,
) -> RunMetrics:
    """Resumable ccnet line dedup: ids -> global line-firsts table (the
    corpus-wide aggregation) -> rebuild + write."""
    from sparkdedup.exact import ccnet_line_firsts, ccnet_rebuild

    m = RunMetrics(mode="ccnet")
    os.makedirs(work_dir, exist_ok=True)
    firsts_path = os.path.join(work_dir, "line_firsts.parquet")

    ids_df = _stage_ids(spark, input_path, work_dir, id_column, m)

    t = time.time()
    if _complete(firsts_path):
        m.stages["line_firsts"] = StageInfo(time.time() - t, resumed=True)
    else:
        ccnet_line_firsts(ids_df, cfg, DOC_ID).write.parquet(firsts_path, mode="overwrite")
        m.stages["line_firsts"] = StageInfo(time.time() - t)
    firsts = spark.read.parquet(firsts_path)
    m.stages["line_firsts"].rows = firsts.count()

    t = time.time()
    kept = ccnet_rebuild(ids_df, firsts, cfg, DOC_ID)
    return _finalize(spark, kept, output_path, m, metrics_path, t)
