"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (driver extras).

The decode/feature kernels are STUBS in this sandbox (no image/audio libs
baked in — see the clearly-marked NotImplementedError / deterministic-fake
paths) but the Spark-side plumbing is real and tested: schemas, Arrow batch
shapes, partitioning, and the mapInPandas UDF signatures are exactly what a
production decode stage uses; swapping the fake for PIL/librosa is a
one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes int"

REAL_DECODERS = False  # flip when PIL / soundfile are available


def media_table(df: DataFrame, payload_col: str, kind: str,
                id_col: str) -> DataFrame:
    """Wrap an arbitrary binary column as a typed media table."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    )


def _fake_decode(payload: bytes, kind: str, n_dims: int = 16) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: a unit-norm
    vector derived from the payload digest. NOT a real decoder — gated
    behind REAL_DECODERS so production swaps in PIL/librosa/ffmpeg."""
    if REAL_DECODERS:  # pragma: no cover
        raise NotImplementedError("wire a real decoder (PIL/librosa) here")
    h = hashlib.blake2b(payload or b"", digest_size=n_dims * 2,
                        person=kind.encode()[:16]).digest()
    vals = [
        int.from_bytes(h[2 * i:2 * i + 2], "big") / 65535.0 - 0.5
        for i in range(n_dims)
    ]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


def extract_features(media: DataFrame, n_dims: int = 16) -> DataFrame:
    """mapInPandas decode/feature stage — Arrow-batched, one vector per
    media row. Batch shape and schema are production-real; the kernel is
    the deterministic fake above."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p if p is not None else b"", k, n_dims)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame index.
    Relational (sequence+explode); the actual frame decode is the stubbed
    kernel. Shows the partition-explode pattern a real sampler uses."""
    return (
        media.where(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce("n_frames", F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .select("media_id", "frame_idx")
    )
