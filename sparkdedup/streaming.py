"""Structured Streaming dedup surface.

The reference is batch-only (SURVEY.md §2.9: no streaming of any kind);
these operators extend the engine to continuously-arriving corpora —
the shape a production training-data pipeline actually has (new crawl
shards landing as files):

  * ``streaming_exact_dedup`` — keep the first-seen occurrence of each
    content hash across micro-batches; state is bounded by a watermark
    (``dropDuplicatesWithinWatermark``), so the operator survives
    unbounded streams.
  * ``streaming_signatures`` — stateless MinHash band signatures on a
    stream (the Arrow UDF is stateless, so it composes with any
    downstream stateful operator); emits the exploded band table for a
    periodic batch LSH/CC job over the accumulated output (the standard
    lambda split: streaming fingerprinting, batch clustering).

Both run with ``trigger(availableNow=True)`` for drain-and-stop
semantics in tests and backfills.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdedup.config import ExactHashConfig, MinHashConfig
from sparkdedup.exact import content_hash
from sparkdedup.minhash import SIG, make_signature_udf


def read_document_stream(
    spark: SparkSession,
    input_path: str,
    schema: str = "doc_id long, text string",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-source document stream (new parquet files under input_path)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def streaming_exact_dedup(
    stream: DataFrame,
    cfg: ExactHashConfig = ExactHashConfig(),
    watermark_delay: str = "10 minutes",
    ts_col: Optional[str] = None,
) -> DataFrame:
    """First-seen-wins exact dedup over a stream.

    Without an event-time column, arrival time is used; the watermark
    bounds the dedup state (duplicates farther apart than the delay can
    recur — the documented streaming trade-off vs the batch operator).
    """
    ts = F.col(ts_col) if ts_col else F.current_timestamp()
    hashed = stream.withColumn("__h__", content_hash(F.col(cfg.column), cfg.hash_func)).withColumn(
        "__ts__", ts
    )
    return (
        hashed.withWatermark("__ts__", watermark_delay)
        .dropDuplicatesWithinWatermark(["__h__"])
        .drop("__h__", "__ts__")
    )


def streaming_signatures(
    stream: DataFrame,
    cfg: MinHashConfig = MinHashConfig(),
    id_col: str = "doc_id",
    ts_col: Optional[str] = None,
) -> DataFrame:
    """Stateless streaming MinHash banding: (id, band, hash[, ts]).

    ``ts_col`` carries an event-time column through for a downstream
    event-time-TTL'd stateful operator (streaming_band_collisions)."""
    sig_udf = make_signature_udf(cfg)
    cols = [F.col(id_col), F.posexplode(SIG).alias("band", "hash")]
    if ts_col:
        cols.append(F.col(ts_col))
    return (
        stream.withColumn(SIG, sig_udf(F.col(cfg.column)))
        .filter(F.col(SIG).isNotNull())
        .select(*cols)
    )


def streaming_band_collisions(
    band_stream: DataFrame,
    timeout_minutes: int = 0,
    id_col: str = "doc_id",
    ts_col: Optional[str] = None,
    ttl_minutes: int = 0,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState):
    cross-micro-batch LSH collision detection.

    State per 128-bit band key = the minimum doc id ever seen. Each
    arriving (id, band, hash) row either (a) records a new key in state
    and emits nothing, or (b) collides with state and emits the
    candidate edge (src=id, dst=state min) — the streaming analogue of
    ``minhash.band_edges``.

    State bounding (VERDICT r3 #5 — an unbounded stream must not grow
    state forever), three modes:

    * ``ttl_minutes > 0`` (requires ``ts_col``): EVENT-TIME TTL. The
      input is watermarked (``watermark_delay``) and a band key expires
      ``ttl_minutes`` after the latest event that touched it (by event
      time, evaluated against the watermark) — expired keys are
      REMOVED, so steady-state size is ~keys-per-TTL-window. Duplicates
      farther apart than the TTL can recur (the same recall trade-off
      as the watermarked exact dedup). Event-time timeouts advance with
      the data, so ``availableNow`` drains terminate normally.

      Expiry is PER BAND KEY, not per document — the deliberate
      contract (pinned by test_streaming_ttl_band_wise_expiry_contract):
      a doc's B band keys age independently, each refreshed by whichever
      later docs touch it, so past the TTL a near-dup still matches
      through any refreshed shared band while expired bands have
      forgotten the doc — cross-batch recall degrades band-by-band
      (gracefully, with the band-collision probability), never
      atomically per doc. Doc-atomic expiry would need cross-key
      coordination (state here is keyed by band), i.e. a second stateful
      stage keyed by doc feeding evictions back — a full extra shuffle
      per micro-batch for strictly less graceful degradation.
    * ``timeout_minutes > 0``: processing-time timeout — wall-clock
      TTL for continuously-running queries. NOT for availableNow
      drains: the engine keeps scheduling timeout-handling
      micro-batches and the drain never terminates.
    * both zero: state kept forever (bounded corpora / backfills only).

    Input: output of ``streaming_signatures`` (doc_id, band, hash[, ts]).
    Output: (src, dst) candidate edges for a downstream batch CC.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    if ttl_minutes > 0 and not ts_col:
        raise ValueError("ttl_minutes requires ts_col (an event-time column)")
    if ttl_minutes > 0 and timeout_minutes > 0:
        raise ValueError("pick one of ttl_minutes (event-time) or timeout_minutes")

    out_schema = StructType([StructField("src", LongType()), StructField("dst", LongType())])
    state_schema = StructType([StructField("min_id", LongType())])

    # select the id BY NAME — a caller reordering (band, hash, id)
    # must not silently hash the band as the doc id
    cols = [
        F.xxhash64("band", "hash").alias("k1"),
        F.xxhash64("hash", F.lit(0x9E3779B9), "band").alias("k2"),
        F.col(id_col).alias("id"),
    ]
    if ttl_minutes > 0:
        cols.append(F.col(ts_col).alias("__ts__"))
        keyed = band_stream.select(*cols).withWatermark("__ts__", watermark_delay)
    else:
        keyed = band_stream.select(*cols)
    ttl_ms = ttl_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()  # evict — this is the whole point of the TTL
            return
        ids = []
        max_ts_ms = None
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["id"])
            if ttl_ms and len(pdf):
                m = pd.to_datetime(pdf["__ts__"]).max()
                t = int(m.value // 1_000_000)
                max_ts_ms = t if max_ts_ms is None else max(max_ts_ms, t)
        if not ids:
            return
        batch_min = min(ids)
        if state.exists:
            (cur_min,) = state.get
        else:
            cur_min = None
        new_min = batch_min if cur_min is None else min(cur_min, batch_min)
        state.update((new_min,))
        if ttl_ms:
            # expire TTL past the latest event seen; timeout timestamps
            # must exceed the current watermark, so clamp for very late
            # (but in-watermark) arrivals
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(max_ts_ms + ttl_ms, wm + 1000))
        elif timeout_minutes > 0:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        edges = [(i, new_min) for i in ids if i != new_min]
        if cur_min is not None and cur_min != new_min:
            edges.append((cur_min, new_min))
        if edges:
            yield pd.DataFrame(edges, columns=["src", "dst"])

    if ttl_minutes > 0:
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    elif timeout_minutes > 0:
        timeout_conf = GroupStateTimeout.ProcessingTimeTimeout
    else:
        timeout_conf = GroupStateTimeout.NoTimeout
    return keyed.groupBy("k1", "k2").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def run_to_parquet(
    result: DataFrame, output_path: str, checkpoint_path: str
) -> None:
    """Drain the stream to parquet with availableNow semantics."""
    (
        result.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
