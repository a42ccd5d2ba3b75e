"""Embedding similarity search & embedding-cosine near-dup detection.

The reference's ann_unisim.py mode (embed → index → adaptive top-k →
union matches) needs ONNX model weights and is WIP upstream
(/root/reference/text_dedup/ann_unisim.py:75-158, Original_README.md:25);
here the *search* machinery is rebuilt Spark-first over a pre-computed
embedding column (array<float>):

  * brute-force cosine: JVM-side zip_with/aggregate dot products —
    exact baseline, O(Q*N), broadcast the query side.
  * sign-random-projection LSH buckets (one pandas UDF, NumPy matmul
    per Arrow batch) → candidates join per hash table → exact cosine
    verify: the scale path (shuffle on bucket keys, no cross join).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from sparkdedup.config import ANNConfig


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns (JVM-side)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def unit_vector(a: Column) -> Column:
    """L2-normalize once per row so pairwise cosine degrades to a dot
    product — norms are NOT recomputed per candidate pair."""
    norm = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.transform(a, lambda x: x / norm)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    cfg: ANNConfig = ANNConfig(),
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    (query_id, neighbor_id, sim, rank); self-matches excluded. The
    query side is broadcast — the corpus side streams, so this scales
    with corpus size for bounded query sets.
    """
    idc, vc = cfg.id_column, cfg.vector_column
    q = queries.select(
        F.col(idc).alias("query_id"), unit_vector(F.col(vc).cast("array<double>")).alias("qv")
    )
    v = vectors.select(
        F.col(idc).alias("neighbor_id"), unit_vector(F.col(vc).cast("array<double>")).alias("nv")
    )
    from pyspark.sql import Window

    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", dot(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cfg.top_k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )


def _hyperplanes(dim: int, cfg: ANNConfig) -> np.ndarray:
    rng = np.random.RandomState(cfg.seed)
    return rng.standard_normal((cfg.num_tables, cfg.num_hyperplanes, dim)).astype(np.float64)


def make_bucket_udf(dim: int, cfg: ANNConfig):
    """UDF: embedding -> array<long> of one SRP bucket id per table.

    NumPy: one (batch, dim) x (dim, T*H) matmul per Arrow batch, sign
    bits packed to integers.
    """
    planes = _hyperplanes(dim, cfg)
    flat = planes.reshape(cfg.num_tables * cfg.num_hyperplanes, dim).T  # (dim, T*H)
    weights = (1 << np.arange(cfg.num_hyperplanes, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        from sparkdedup.tuning import tune_worker_memory

        tune_worker_memory()
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (mat @ flat) > 0  # (batch, T*H)
        bits = bits.reshape(len(vecs), cfg.num_tables, cfg.num_hyperplanes)
        ids = (bits * weights).sum(axis=2)  # (batch, T)
        return pd.Series(list(ids))

    return buckets


def lsh_buckets(vectors: DataFrame, dim: int, cfg: ANNConfig = ANNConfig()) -> DataFrame:
    """(id, table, bucket) — exploded SRP bucket assignment."""
    udf = make_bucket_udf(dim, cfg)
    return vectors.select(
        F.col(cfg.id_column).alias("id"), F.posexplode(udf(F.col(cfg.vector_column))).alias("table", "bucket")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    cfg: ANNConfig = ANNConfig(),
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans-partition the
    corpus, search each query only in its ``n_probe`` nearest cells.

    The scale path for large query sets: the corpus is shuffled ONCE on
    the (tiny-cardinality) cell id, queries join only their probed
    cells — no cross join. Deterministic (fixed KMeans seed); recall
    rises with n_probe (n_probe == n_centroids is exact).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import Window

    idc, vc = cfg.id_column, cfg.vector_column
    v = vectors.select(
        F.col(idc).alias("neighbor_id"), unit_vector(F.col(vc).cast("array<double>")).alias("nv")
    ).persist()
    ml = v.withColumn("features", array_to_vector(F.col("nv")))
    model = KMeans(k=n_centroids, seed=cfg.seed, featuresCol="features").fit(ml)
    assigned = model.transform(ml).select("neighbor_id", "nv", F.col("prediction").alias("cell"))

    centroids = [np.asarray(c).tolist() for c in model.clusterCenters()]
    cent_df = F.array(*[
        F.struct(F.lit(i).alias("cell"), F.array(*[F.lit(float(x)) for x in c]).alias("cv"))
        for i, c in enumerate(centroids)
    ])
    q = queries.select(
        F.col(idc).alias("query_id"), unit_vector(F.col(vc).cast("array<double>")).alias("qv")
    ).withColumn("cents", cent_df)
    # rank centroids per query by dot product, keep n_probe cells
    probed = (
        q.select(
            "query_id",
            "qv",
            F.explode("cents").alias("c"),
        )
        .withColumn("cdot", dot(F.col("qv"), F.col("c.cv")))
        .withColumn(
            "crank",
            F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("cdot"))),
        )
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qv", F.col("c.cell").alias("cell"))
    )
    scored = (
        assigned.join(F.broadcast(probed), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", dot(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cfg.top_k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )
    return out


def near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    cfg: ANNConfig = ANNConfig(),
    exact: bool = False,
) -> DataFrame:
    """All unordered pairs with cosine >= cfg.threshold.

    exact=True: O(N^2) self-join (small inputs / oracle parity).
    exact=False: SRP-LSH candidate generation (pairs sharing any
    bucket) + exact cosine verification — approximate recall but no
    quadratic shuffle; this is the 100TB path.
    """
    idc, vc = cfg.id_column, cfg.vector_column
    v = vectors.select(
        F.col(idc).alias("id"), unit_vector(F.col(vc).cast("array<double>")).alias("v")
    )
    if exact:
        cand = (
            v.alias("a")
            .join(v.withColumnRenamed("id", "id_b").withColumnRenamed("v", "vb").alias("b"),
                  F.col("a.id") < F.col("b.id_b"))
            .select(F.col("a.id").alias("id_a"), F.col("id_b"), F.col("a.v").alias("va"), F.col("vb"))
        )
    else:
        b = lsh_buckets(vectors, dim, cfg)
        pairs = (
            b.alias("x")
            .join(b.withColumnRenamed("id", "id_b").alias("y"), on=["table", "bucket"])
            .filter(F.col("x.id") < F.col("id_b"))
            .select(F.col("x.id").alias("id_a"), "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        cand = (
            pairs.join(v.withColumnRenamed("id", "id_a").withColumnRenamed("v", "va"), on="id_a")
            .join(v.withColumnRenamed("id", "id_b").withColumnRenamed("v", "vb"), on="id_b")
        )
    return (
        cand.withColumn("sim", dot(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= cfg.threshold)
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )
