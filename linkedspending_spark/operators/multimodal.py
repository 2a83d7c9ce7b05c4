"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns plus typed
metadata — the Spark-side contract (schema, partitioning, Arrow batch
shape) is real and tested; the actual decoders are stubbed behind
import-tries because the sandbox has no image/audio libraries
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
    """Return a real decoder when the library exists — STUB in sandbox."""
    try:  # pragma: no cover - libs absent in sandbox
        if media_type == "image":
            from PIL import Image  # noqa: F401

            raise NotImplementedError("wire PIL decode here at deployment")
        if media_type == "audio":
            import soundfile  # noqa: F401

            raise NotImplementedError("wire soundfile decode here at deployment")
    except ImportError:
        return None
    return None


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding from the payload digest.

    Stands in for the real decode→embed step so the Spark-side plumbing
    (batch shape, schema, partitioning) is fully exercised and testable.
    """
    h = hashlib.sha256(payload or b"").digest()
    return [
        struct.unpack("<i", h[4 * i : 4 * i + 4])[0] / 2**31 for i in range(dim)
    ]


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    One Arrow batch in, one out; decode is the deterministic fake (or a
    real decoder when available — see ``_try_real_decoder``).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _fake_feature(b, dim)),
                    "decode_status": pdf["media_type"].map(
                        lambda m: "stubbed"
                        if _try_real_decoder(m) is None
                        else "decoded"
                    ),
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
