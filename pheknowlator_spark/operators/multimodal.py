"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs. The Spark
side — schema, partitioning, Arrow batch shape, UDF signatures — is real
and tested; the actual codec work is stubbed behind ``DecodeUnavailable``
(the container ships no image/audio libs) with a deterministic fake decoder
for tests, clearly marked.

Pattern at scale: ``mapInPandas`` so each Arrow batch amortizes codec
setup; media tables partitioned by (modality, bucket(content_id)) so decode
fan-out is even; metadata-only queries never touch the binary column
(columnar pruning — verified in tests via the scan's ReadSchema).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "content_id string, modality string, media binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = "content_id string, modality string, feature array<float>, n_bytes int"


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: codec libraries are not installed.

    Wire in PIL/librosa/pyav here when the runtime image has them; the
    Spark-side contract (batch iterator of pandas DataFrames in,
    FEATURE_SCHEMA out) stays identical.
    """


def real_decode(media: bytes, modality: str):  # pragma: no cover - stub
    raise DecodeUnavailable(
        f"no codec available for modality={modality!r}; install an image/audio "
        "library and replace multimodal.real_decode"
    )


def fake_decode(media: bytes, modality: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature extractor: md5-seeded unit vector.

    Used by tests and the bench so the plumbing (batching, schema,
    partitioning) is exercised end-to-end without codecs.
    """
    h = hashlib.md5((modality or "").encode() + (media or b"")).digest()
    vals = [
        int.from_bytes(h[i * 2: i * 2 + 2], "big") / 65535.0 for i in range(dim)
    ]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


def extract_features(
    media_df: DataFrame, use_fake: bool = True, dim: int = 8
) -> DataFrame:
    """Decode/feature-extract media binaries via mapInPandas (Arrow batches)."""
    decode = fake_decode if use_fake else real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for media, modality in zip(pdf["media"], pdf["modality"]):
                raw = bytes(media) if media is not None else b""
                feats.append(decode(raw, modality, dim) if use_fake else decode(raw, modality))
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "content_id": pdf["content_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "n_bytes": sizes,
                }
            )

    return media_df.select("content_id", "modality", "media").mapInPandas(
        run, FEATURE_SCHEMA
    )


def frame_sample_plan(
    media_df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: one row per (content_id, frame_ts_ms)
    derived from metadata only — the binary column is never read (check the
    scan's ReadSchema). The actual frame grab would run in extract_features.
    """
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media_df.filter(F.col("modality") == "video").select(
        "content_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = hashlib.md5(f"media:{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                f"m{i}",
                modality,
                bytearray(payload),
                {
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[modality],
                    "width": 64 + i if modality == "image" else None,
                    "height": 64 + i if modality == "image" else None,
                    "duration_ms": 5000 + 100 * i if modality != "image" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
