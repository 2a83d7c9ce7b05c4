"""Multimodal plumbing: binary columns through mapInPandas, plans."""

from __future__ import annotations

import hashlib
import struct

from linkedspending_spark.operators.multimodal import (
    ASSET_SCHEMA,
    _decode_ppm,
    _decode_wav,
    extract_features,
    frame_sample_plan,
    resize_plan,
)


def make_wav(samples: list[int], rate: int = 8000) -> bytes:
    """Synthesize a minimal mono PCM-16 RIFF/WAVE payload."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def make_ppm(w: int, h: int, row_vals: list[int], comment: bool = False) -> bytes:
    """Synthesize a P6 PPM: every pixel in row r has value row_vals[r]."""
    hdr = b"P6\n" + (b"# synthetic fixture\n" if comment else b"")
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + b"".join(bytes([v]) * (w * 3) for v in row_vals)


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


def test_wav_decode_end_to_end(spark):
    """Round-3 VERDICT item 7: a real (pure-Python) decoder must drive
    decode_status='decoded' through extract_features for WAV payloads,
    with the feature carrying actual signal content, not the digest."""
    # constant-magnitude square wave → RMS of every slice is exactly 0.5
    wav = make_wav([16384 if i % 2 == 0 else -16384 for i in range(64)])
    ppm = make_ppm(2, 8, [0, 255, 0, 255, 0, 255, 0, 255], comment=True)
    rows = [
        ("w1", "c1", 0, "audio", "audio/wav", wav, None, None, 8),
        ("p1", "c1", 1, "image", "image/x-portable-pixmap", ppm, 2, 8, None),
        ("g1", "c2", 0, "audio", "audio/wav", b"RIFF fake", None, None, 1),
    ]
    out = {
        r["asset_id"]: r
        for r in extract_features(
            spark.createDataFrame(rows, ASSET_SCHEMA), dim=8
        ).collect()
    }
    assert out["w1"]["decode_status"] == "decoded"
    assert out["w1"]["feature"] == [0.5] * 8
    assert out["p1"]["decode_status"] == "decoded"
    assert out["p1"]["feature"] == [0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0]
    # malformed magic-prefixed payload falls back to the digest stub
    assert out["g1"]["decode_status"] == "stubbed"
    assert len(out["g1"]["feature"]) == 8


def test_decoders_reject_malformed():
    wav = make_wav([1000] * 32)
    assert _decode_wav(wav, 4) is not None
    assert _decode_wav(wav[:-10], 4) is None  # truncated data chunk
    assert _decode_wav(b"RIFX" + wav[4:], 4) is None  # wrong magic
    ppm = make_ppm(3, 4, [10, 20, 30, 40])
    assert _decode_ppm(ppm, 4) is not None
    assert _decode_ppm(ppm[:-5], 4) is None  # missing pixels
    assert _decode_ppm(b"P6\n3 4\n70000\n" + b"\x00" * 36, 4) is None  # 16-bit


def test_resize_plan(spark):
    got = {r["asset_id"]: (r["target_w"], r["target_h"]) for r in resize_plan(_assets(spark), 512).collect()}
    assert got["a1"] == (512, 384)  # 800x600 downscaled
    assert got["a2"] == (300, 200)  # under the cap → unchanged


def test_frame_sample_plan(spark):
    got = [r["frame_ms"] for r in frame_sample_plan(_assets(spark), 1000).collect()]
    assert got == [0, 1000, 2000, 3000]  # a4: 3500ms video


def test_decode_false_forces_stub(spark):
    """decode=False stubs EVERY payload — the oracle-replayable mode the
    registry query uses: a payload that would really decode (valid PPM
    magic) must still come back as the digest stub so the Spark result
    is a pure function of the bytes, like the SQL twin."""
    import pandas as pd

    ppm = b"P6 2 2 255\n" + bytes(12)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": ["a1"],
                "conv_id": [None],
                "turn_idx": [None],
                "media_type": ["image"],
                "mime": ["image/x-portable-pixmap"],
                "content": [ppm],
                "width": [2],
                "height": [2],
                "duration_ms": [None],
            }
        )
    )
    real = extract_features(df).collect()[0]
    stub = extract_features(df, decode=False).collect()[0]
    assert real["decode_status"] == "decoded"
    assert stub["decode_status"] == "stubbed"
    assert stub["feature"] != real["feature"]


def test_decoder_seam_degrades_not_fails(monkeypatch):
    """The plug-in seam can be broken three ways — a raising builder, a
    callable that raises on a payload, a callable returning the wrong
    shape — and every one degrades to the digest stub (cached where it
    is a seam-level failure), never a task failure."""
    from linkedspending_spark.operators import multimodal as mm

    def _raise_builder(_m):
        raise RuntimeError("broken plug-in")

    monkeypatch.setattr(mm, "_try_real_decoder", _raise_builder)
    mm._REAL_DECODERS.clear()
    f, status = mm._decode_or_stub("video", b"xyz", 4)
    assert status == "stubbed" and len(f) == 4
    assert mm._REAL_DECODERS["video"] is None  # failure cached, one probe

    mm._REAL_DECODERS.clear()
    monkeypatch.setattr(
        mm, "_try_real_decoder", lambda m: (lambda p, d: [0.5] * d)
    )
    f, status = mm._decode_or_stub("video", b"xyz", 4)
    assert status == "decoded" and f == [0.5] * 4

    mm._REAL_DECODERS.clear()

    def _bad_payload(_p, _d):
        raise ValueError("bad payload")

    monkeypatch.setattr(mm, "_try_real_decoder", lambda m: _bad_payload)
    f, status = mm._decode_or_stub("video", b"xyz", 4)
    assert status == "stubbed" and len(f) == 4

    mm._REAL_DECODERS.clear()
    monkeypatch.setattr(
        mm, "_try_real_decoder", lambda m: (lambda p, d: [0.1])  # wrong dim
    )
    assert mm._decode_or_stub("video", b"xyz", 4)[1] == "stubbed"
    mm._REAL_DECODERS.clear()
