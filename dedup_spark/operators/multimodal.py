"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (driver extras).

The Spark-side plumbing is real and tested: schemas, Arrow batch shapes,
partitioning, and the mapInPandas UDF signatures are exactly what a
production decode stage uses. The decode kernel is DISPATCHED at import
time: if PIL is importable the real image decoder runs; otherwise a
clearly-marked deterministic fake stands in (this sandbox has no
image/audio libs baked in, so it always takes the fake branch here —
the dispatch itself is unit-tested so the "one-function swap" is code,
not a claim).
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

# import probe: real decoders when the libs exist, deterministic fake
# otherwise. Flipping environments changes behavior with zero code edits.
try:  # pragma: no cover - sandbox has no PIL
    from PIL import Image as _PILImage

    REAL_DECODERS = True
except ImportError:
    _PILImage = None
    REAL_DECODERS = False


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


def _real_decode(payload: bytes, kind: str, n_dims: int = 16) -> list[float]:
    """Real decode→feature-extract for images: PIL decode, grayscale
    thumbnail, unit-norm pixel vector. Only reachable when PIL imported
    (REAL_DECODERS); non-image kinds fall back to the fake until an
    audio/video lib is probed the same way. A corrupt/undecodable payload
    must not fail the whole stage after task retries (ADVICE r3), so
    decode errors degrade to the deterministic fake vector per row —
    a web-scale media corpus always contains broken blobs."""
    if kind != "image" or _PILImage is None:
        return _fake_decode(payload, kind, n_dims)
    import io
    import math

    try:
        img = _PILImage.open(io.BytesIO(payload)).convert("L")
        side = max(1, int(math.isqrt(n_dims)))
        img = img.resize((side, max(1, n_dims // side)))
        vals = [p / 255.0 - 0.5 for p in img.getdata()][:n_dims]
    except Exception:
        # PIL raises UnidentifiedImageError/OSError/ValueError depending
        # on how the payload is broken; all of them mean "not decodable"
        return _fake_decode(payload, kind, n_dims)
    vals += [0.0] * (n_dims - len(vals))
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


def _fake_decode(payload: bytes, kind: str, n_dims: int = 16) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: a unit-norm
    vector derived from the payload digest. NOT a real decoder — the
    import probe above selects it only when the real libs are absent."""
    h = hashlib.blake2b(payload or b"", digest_size=n_dims * 2,
                        person=kind.encode()[:16]).digest()
    vals = [
        int.from_bytes(h[2 * i:2 * i + 2], "big") / 65535.0 - 0.5
        for i in range(n_dims)
    ]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / norm for v in vals]


decode_feature = _real_decode if REAL_DECODERS else _fake_decode


def extract_features(media: DataFrame, n_dims: int = 16) -> DataFrame:
    """mapInPandas decode/feature stage — Arrow-batched, one vector per
    media row. Batch shape and schema are production-real; the kernel is
    whatever ``decode_feature`` dispatched to at import time."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_feature(p if p is not None else b"", k, n_dims)
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
