"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns plus typed
metadata — the Spark-side contract (schema, partitioning, Arrow batch
shape) is real and tested. Uncompressed containers (RIFF/WAVE PCM-16,
PPM P6) are decoded end-to-end by dependency-free pure-Python parsers
(``_decode_wav`` / ``_decode_ppm``); compressed codecs are stubbed
behind import-tries because the sandbox has no image/audio libraries
(clearly marked below — plug in PIL/torchaudio at deployment).

Pattern: ``mapInPandas`` for whole-batch feature extraction (the iterator
form keeps memory bounded: one Arrow batch in flight per task), scalar
``pandas_udf`` for per-asset metadata. Partitioning: assets are bucketed
by ``pmod(xxhash64(asset_id), n)`` so decode work spreads uniformly
regardless of per-conversation attachment skew.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),  # opaque payload
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "asset_id string, media_type string, n_bytes long, sha256 string, "
    "feature array<float>, decode_status string"
)


def _try_real_decoder(media_type: str):
    """Return a decode CALLABLE ``(payload, dim) -> list[float] | None``
    when the library exists, else None — the plug-in seam for
    heavyweight codecs (JPEG/PNG via PIL, compressed audio via
    soundfile). Uncompressed container formats — RIFF/WAVE PCM and PPM
    P6 — are decoded by the dependency-free pure-Python paths below and
    never reach this seam. A raising seam (or a callable that raises on
    a payload) degrades to the digest stub instead of failing the
    mapInPandas task — see ``_real_decoder`` / ``_decode_or_stub``."""
    if media_type == "image":
        try:  # pragma: no cover - lib absent in sandbox
            from PIL import Image
        except ImportError:
            return None

        def _pil_decode(payload: bytes, dim: int):  # pragma: no cover
            import io

            img = Image.open(io.BytesIO(payload)).convert("L")
            img = img.resize((dim, 1))
            return [p / 255.0 for p in img.getdata()]

        return _pil_decode
    if media_type == "audio":
        try:  # pragma: no cover - lib absent in sandbox
            import soundfile
        except ImportError:
            return None

        def _sf_decode(payload: bytes, dim: int):  # pragma: no cover
            import io

            data, _rate = soundfile.read(io.BytesIO(payload))
            if getattr(data, "ndim", 1) > 1:
                data = data.mean(axis=1)
            n = len(data)
            if n == 0:
                return None
            return [
                float(
                    (sum(s * s for s in data[i * n // dim : (i + 1) * n // dim])
                     / max(1, len(data[i * n // dim : (i + 1) * n // dim])))
                    ** 0.5
                )
                for i in range(dim)
            ]

        return _sf_decode
    return None


def _decode_wav(payload: bytes, dim: int) -> list[float] | None:
    """Pure-Python RIFF/WAVE PCM-16 decode → per-segment RMS feature.

    Walks the RIFF chunk list (word-aligned), requires a PCM (format 1)
    16-bit ``fmt `` chunk and a ``data`` chunk, and returns ``dim`` RMS
    amplitudes over equal sample slices, normalized to [0, 1].  Any
    malformed header/truncated payload returns None (caller falls back
    to the digest stub) — never raises mid-batch."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + csz]
        if len(body) < csz:
            return None
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_ch, _rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        return None
    n = len(data) // 2
    if n == 0:
        return None
    samples = struct.unpack(f"<{n}h", data[: 2 * n])
    feats = []
    for i in range(dim):
        seg = samples[i * n // dim : (i + 1) * n // dim]
        if not seg:
            feats.append(0.0)
        else:
            feats.append(
                (sum(s * s for s in seg) / len(seg)) ** 0.5 / 32768.0
            )
    return feats


def _decode_ppm(payload: bytes, dim: int) -> list[float] | None:
    """Pure-Python PPM (P6, 8-bit) decode → per-band mean intensity.

    Parses the ASCII header (``P6`` width height maxval, ``#`` comments
    allowed), requires the full raw RGB payload to be present, and
    returns ``dim`` mean pixel intensities over equal horizontal bands,
    normalized by maxval.  Malformed input returns None."""
    if not payload.startswith(b"P6"):
        return None
    pos, vals = 2, []
    while len(vals) < 3 and pos < len(payload):
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        vals.append(int(payload[start:pos]))
    if len(vals) < 3:
        return None
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        return None
    pos += 1  # exactly one whitespace byte after maxval
    need = w * h * 3
    pix = payload[pos : pos + need]
    if len(pix) < need:
        return None
    feats = []
    for i in range(dim):
        lo, hi = i * h // dim, (i + 1) * h // dim
        band = pix[lo * w * 3 : hi * w * 3]
        if not band:
            feats.append(0.0)
        else:
            feats.append(sum(band) / len(band) / maxval)
    return feats


# one import probe per media type per worker, not per row — a failed
# import re-scans sys.path every call, which is a per-asset tax inside
# the mapInPandas hot loop
_REAL_DECODERS: dict[str, object] = {}


def _real_decoder(media_type: str):
    """Cached seam lookup: a seam that RAISES while building is cached
    as None (one log-free degradation per executor, not a per-batch
    task failure)."""
    if media_type not in _REAL_DECODERS:
        try:
            _REAL_DECODERS[media_type] = _try_real_decoder(media_type)
        except Exception:  # broken plug-in: degrade to the stub, cached
            _REAL_DECODERS[media_type] = None
    return _REAL_DECODERS[media_type]


def _decode_or_stub(media_type: str, payload: bytes, dim: int):
    """Decode one payload: pure-Python WAV/PPM when the magic + full
    header parse succeeds, the library seam when present, else the
    deterministic digest stub.  Returns (feature, decode_status). A
    seam callable that raises or returns None on a payload falls back
    to the stub for THAT payload — a decode failure is per-row data,
    never a task failure."""
    payload = payload or b""
    if media_type == "audio":
        f = _decode_wav(payload, dim)
        if f is not None:
            return f, "decoded"
    if media_type == "image":
        f = _decode_ppm(payload, dim)
        if f is not None:
            return f, "decoded"
    dec = _real_decoder(media_type)  # plug-in seam: None in sandbox
    if dec is not None:
        try:
            f = dec(payload, dim)
        except Exception:
            f = None
        if f is not None and len(f) == dim:
            return [float(x) for x in f], "decoded"
    return _fake_feature(payload, dim), "stubbed"


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding from the payload digest.

    Stands in for the real decode→embed step so the Spark-side plumbing
    (batch shape, schema, partitioning) is fully exercised and testable.
    """
    h = hashlib.sha256(payload or b"").digest()
    return [
        struct.unpack("<i", h[4 * i : 4 * i + 4])[0] / 2**31 for i in range(dim)
    ]


def extract_features(
    assets: DataFrame, dim: int = 8, decode: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Arrow batch in, one out; decode is the pure-Python WAV/PPM path
    or a real decoder when available (see ``_try_real_decoder``), else
    the deterministic digest fake. ``decode=False`` forces the digest
    stub for EVERY payload — the mode an oracle-replayable pipeline
    stage wants, since the stub is a pure function of the bytes while
    real decode output depends on what the bytes happen to parse as.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            decoded = [
                _decode_or_stub(m, b, dim)
                if decode
                else (_fake_feature(b, dim), "stubbed")
                for m, b in zip(pdf["media_type"], payloads)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": [f for f, _ in decoded],
                    "decode_status": [s for _, s in decoded],
                }
            )

    return assets.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_plan(assets: DataFrame, max_side: int = 512) -> DataFrame:
    """Pure-metadata resize planning (no decode): target dims preserving
    aspect ratio — native expressions, exercised on width/height columns."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return assets.select(
        "asset_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per planned frame
    timestamp (sequence+explode — plumbing for the real frame extractor)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        assets.where(F.col("media_type") == "video")
        .select("asset_id", F.explode(frames).alias("frame_ms"))
    )
