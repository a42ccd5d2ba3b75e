"""Multimodal plumbing: schema, batch shapes, dedup, frame fan-out.
The codec layer is a documented deterministic stub; what's tested is
the Spark-side contract."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkdedup.multimodal import (
    ASSET_SCHEMA,
    exact_asset_dedup,
    extract_features,
    sample_frames,
)


@pytest.fixture()
def assets(spark):
    rows = [
        (0, "image", "image/png", b"\x89PNG" + b"a" * 100, 10, 10, None),
        (1, "image", "image/png", b"\x89PNG" + b"a" * 100, 10, 10, None),  # dup of 0
        (2, "audio", "audio/wav", b"RIFF" + b"b" * 500, None, None, 1000),
        (3, "video", "video/mp4", b"ftyp" + bytes(range(256)) * 4, 640, 480, 2000),
        (4, "video", "video/mp4", b"", None, None, 0),  # empty payload
    ]
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def test_extract_features_contract(assets):
    out = extract_features(assets, dim=16).collect()
    assert len(out) == 5
    by_id = {r["asset_id"]: r for r in out}
    assert by_id[0]["sha256"] == hashlib.sha256(b"\x89PNG" + b"a" * 100).hexdigest()
    assert by_id[0]["n_bytes"] == 104
    assert len(by_id[2]["feature"]) == 16
    # determinism + payload sensitivity
    assert by_id[0]["feature"] == by_id[1]["feature"]
    assert by_id[0]["feature"] != by_id[2]["feature"]
    # kind participates in the stub feature (image vs audio of same bytes)
    assert all(0.0 <= v <= 1.0 for v in by_id[3]["feature"])


def test_exact_asset_dedup(assets):
    kept = sorted(r["asset_id"] for r in exact_asset_dedup(assets).collect())
    assert kept == [0, 2, 3, 4]  # asset 1 is a byte-dup of 0


def test_sample_frames_fanout(assets):
    frames = sample_frames(assets, max_frames=4).collect()
    ids = {r["asset_id"] for r in frames}
    assert ids == {3}  # only non-empty videos
    per = [r for r in frames if r["asset_id"] == 3]
    assert 1 <= len(per) <= 4
    assert all(len(r["frame"]) <= 64 for r in per)
    assert sorted(r["frame_no"] for r in per) == list(range(len(per)))
