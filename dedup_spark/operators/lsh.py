"""Stage 4a: LSH banding — signatures → candidate pairs (SURVEY.md J7).

Plan shape (all relational, one shuffle on the band key):

  signatures
    → explode K minhash values into b bands of r rows        (JVM-side)
    → band_hash = xxhash64(band_id, r-slice)                 (JVM-side)
    → skew guard: bucket counts; buckets > max_bucket dropped
      WITH LOGGED METRICS (boilerplate bands are power-law hot;
      north_rule requires explicit skew handling, no silent truncation)
    → self-join within bucket, src < dst
    → distinct pairs

The bucket self-join is quadratic per bucket but bounded by max_bucket;
AQE skew-join splits any residual hot partitions. At 100 TB the band
shuffle is the dominant cost: payload is (band_hash, file_id) only —
16 bytes a row — never content or full signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig


def band_buckets(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Explode signatures into (band_id, band_hash, file_id)."""
    r = cfg.rows_per_band
    # slice(minhash, band*r+1, r) per band; band ids 0..b-1
    bands = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(cfg.bands - 1)),
            lambda band: F.struct(
                band.alias("band_id"),
                F.xxhash64(
                    band, F.slice(F.col("minhash"), band * r + 1, r)
                ).alias("band_hash"),
            ),
        )
    )
    return (
        signatures.where(F.col("n_shingles") > 0)  # empty files never match
        .select("file_id", bands.alias("band"))
        .select("file_id", "band.band_id", "band.band_hash")
    )


def bucket_stats(buckets: DataFrame) -> DataFrame:
    """Bucket-size distribution — the skew metric table."""
    return (
        buckets.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
    )


def candidate_pairs(signatures: DataFrame, cfg: DedupConfig,
                    return_metrics: bool = False):
    """Distinct (src, dst) candidate pairs from banded MinHash.

    Buckets larger than ``cfg.max_bucket`` are excluded from pair
    generation and surfaced in the metrics DataFrame (dropped_buckets,
    dropped_rows) — explicit, logged skew handling instead of a silent
    quadratic blow-up.
    """
    buckets = band_buckets(signatures, cfg)
    # Skew-safe order of operations: bucket SIZES first (count is a
    # map-side partial aggregate — a power-law hot band never materializes
    # anywhere), filter oversize buckets out, and only then collect member
    # lists. Collecting first would OOM a single task on a boilerplate
    # mega-bucket at corpus scale.
    sizes = buckets.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_size")
    )
    kept_keys = sizes.where(
        (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= cfg.max_bucket)
    )
    kept = (
        buckets.join(kept_keys, ["band_id", "band_hash"])
        .groupBy("band_id", "band_hash")
        .agg(F.collect_list("file_id").alias("members"))
    )
    # then explode all unordered pairs in-flight (posexplode + slice — no
    # src<dst self-join); bucket size is capped so the per-row explosion
    # is bounded by max_bucket^2/2
    pairs = (
        kept.select(
            F.posexplode("members").alias("i", "a"), F.col("members")
        )
        .select(
            "a",
            F.explode(
                F.slice(F.col("members"), F.col("i") + 2,
                        F.size("members"))
            ).alias("b"),
        )
        .select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
        .distinct()
    )
    if not return_metrics:
        return pairs
    dropped = sizes.where(F.col("bucket_size") > cfg.max_bucket).agg(
        F.count("*").alias("dropped_buckets"),
        F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("dropped_rows"),
        F.coalesce(F.max("bucket_size"), F.lit(0)).alias("max_bucket_size"),
    )
    return pairs, dropped
