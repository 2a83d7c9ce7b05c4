"""Multimodal plumbing: binary columns through mapInPandas, plans."""

from __future__ import annotations

import hashlib

from linkedspending_spark.operators.multimodal import (
    ASSET_SCHEMA,
    extract_features,
    frame_sample_plan,
    resize_plan,
)


def _assets(spark):
    rows = [
        ("a1", "c1", 0, "image", "image/png", b"\x89PNG fake", 800, 600, None),
        ("a2", "c1", 1, "image", "image/jpeg", b"\xff\xd8 fake", 300, 200, None),
        ("a3", "c2", 0, "audio", "audio/wav", b"RIFF fake", None, None, 2500),
        ("a4", "c2", 1, "video", "video/mp4", b"ftyp fake", 1920, 1080, 3500),
        ("a5", "c3", 0, "image", "image/png", None, None, None, None),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_extract_features_batch_shape(spark):
    out = extract_features(_assets(spark), dim=8).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert len(out) == 5
    r = by_id["a1"]
    assert r["n_bytes"] == len(b"\x89PNG fake")
    assert r["sha256"] == hashlib.sha256(b"\x89PNG fake").hexdigest()
    assert len(r["feature"]) == 8 and all(-1.0 <= x <= 1.0 for x in r["feature"])
    assert r["decode_status"] == "stubbed"
    # deterministic: same payload → same feature
    out2 = {x["asset_id"]: x["feature"] for x in extract_features(_assets(spark), dim=8).collect()}
    assert out2["a1"] == r["feature"]
    # null payload handled
    assert by_id["a5"]["n_bytes"] == 0


def test_resize_plan(spark):
    got = {r["asset_id"]: (r["target_w"], r["target_h"]) for r in resize_plan(_assets(spark), 512).collect()}
    assert got["a1"] == (512, 384)  # 800x600 downscaled
    assert got["a2"] == (300, 200)  # under the cap → unchanged


def test_frame_sample_plan(spark):
    got = [r["frame_ms"] for r in frame_sample_plan(_assets(spark), 1000).collect()]
    assert got == [0, 1000, 2000, 3000]  # a4: 3500ms video
