"""Scale evidence for the substring-dedup redesign: bounded per-doc
state on an adversarial corpus (large fully-duplicated docs mixed into
a normal corpus).

Reports, per doc: duplicated k-windows vs merged (start,end) ranges —
the compression factor that replaces the old collect_list(offsets)
(one array element PER DUPLICATED BYTE) with run-length ranges — plus
E2E wall time for both PASS-B paths.

Writes BENCH/substring_scale.json.
Usage: python tools/substring_scale.py [n_docs] [big_mb] [n_big]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    big_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import pandas as pd
    from pyspark.sql import functions as F

    from sparkdedup.config import SubstringConfig
    from sparkdedup.fixtures import generate_code_files
    from sparkdedup.io import with_doc_id
    from sparkdedup.session import get_spark
    from sparkdedup.suffix import _detect_dup_keys, substring_dedup

    corpus = generate_code_files(n_docs, seed=42)
    # adversarial: n_big byte-identical docs of big_mb MB each — the old
    # design would collect one offset per byte (~big_mb*2^20 array
    # elements) onto a single executor
    unit = "def adversarial(x):\n    return x * 1000003\n"
    big = (unit * (big_mb * (1 << 20) // len(unit) + 1))[: big_mb << 20]
    extra = pd.DataFrame(
        {
            "doc_id": [n_docs + i for i in range(n_big)],
            "content": [big] * n_big,
            "lang": ["python"] * n_big,
            "source": ["adversarial"] * n_big,
            "n_chars": [len(big)] * n_big,
        }
    )
    corpus = pd.concat([corpus, extra[corpus.columns.intersection(extra.columns)]], ignore_index=True)
    path = f"/tmp/substring_scale_{n_docs}_{big_mb}.parquet"
    corpus.to_parquet(path, index=False)

    spark = get_spark(app_name="substring-scale", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    df = with_doc_id(spark.read.parquet(path), id_column="doc_id").persist()
    df.count()
    cfg = SubstringConfig(column="content", k=100)

    report = {"n_docs": int(n_docs + n_big), "big_doc_mb": big_mb, "n_big": n_big, "k": cfg.k}

    # per-doc state: duplicated windows vs merged ranges (the shuffle
    # fallback's island aggregation, measured explicitly)
    from pyspark.sql import Window

    from sparkdedup.suffix import _WIN_SCHEMA, make_window_rows
    from pyspark.sql.types import LongType, StructField, StructType

    dup_keys = _detect_dup_keys(df, cfg).persist()
    wins = df.select("__id__", cfg.column).mapInPandas(
        make_window_rows(cfg, "__id__"),
        schema=StructType([StructField("__id__", LongType())] + list(_WIN_SCHEMA.fields)),
    )
    dup_wins = wins.join(dup_keys.select("h1", "h2"), on=["h1", "h2"], how="leftsemi")
    w = Window.partitionBy("__id__").orderBy("off")
    islands = (
        dup_wins.withColumn(
            "__new__",
            F.when(F.col("off") - F.lag("off").over(w) > F.lit(cfg.k), F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn("__island__", F.sum("__new__").over(w))
        .groupBy("__id__", "__island__")
        .agg(F.count(F.lit(1)).alias("win_in_range"))
    )
    stats = islands.groupBy("__id__").agg(
        F.sum("win_in_range").alias("dup_windows"), F.count(F.lit(1)).alias("ranges")
    )
    agg = stats.agg(
        F.sum("dup_windows").alias("total_dup_windows"),
        F.sum("ranges").alias("total_ranges"),
        F.max("dup_windows").alias("max_doc_dup_windows"),
        F.max("ranges").alias("max_doc_ranges"),
    ).first()
    report["state"] = {
        "total_dup_windows": int(agg["total_dup_windows"]),
        "total_ranges": int(agg["total_ranges"]),
        "max_doc_dup_windows": int(agg["max_doc_dup_windows"]),
        "max_doc_ranges": int(agg["max_doc_ranges"]),
        "compression_factor": round(agg["total_dup_windows"] / max(agg["total_ranges"], 1), 1),
    }
    print("state:", report["state"])

    for name, mbk in (("broadcast", cfg.max_broadcast_keys), ("shuffle", 0)):
        c = SubstringConfig(column="content", k=100, max_broadcast_keys=mbk)
        t0 = time.time()
        res = substring_dedup(df, c, collect_metrics=True)
        wall = round(time.time() - t0, 2)
        report[name] = {
            "wall_sec": wall,
            "path": res.metrics.path,
            "rows_before": res.metrics.rows_before,
            "rows_after": res.metrics.rows_after,
            "dup_keys": res.metrics.dup_keys,
            "duplicated_windows": res.metrics.duplicated_windows,
        }
        res.release()
        print(name, report[name])
        assert res.metrics.path == name

    assert report["broadcast"]["rows_after"] == report["shuffle"]["rows_after"]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "substring_scale.json"), "w") as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
