"""Stage R1: reconstruction — manifest ⋈ unique_chunks → original files.

Spark translation of the reference decoder (/root/reference/reader.go:
167-229, 256-284): instead of walking the index with a block cache, we join
every manifest row to its payload by hash and reassemble per file. Catalyst
/ AQE picks broadcast vs sort-merge for the payload join. Used by the
round-trip correctness tests (content_sha256 equality — the per-row
invariant from BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconstruct(manifest: DataFrame, unique: DataFrame) -> DataFrame:
    """Return (file_id, content) rebuilt from chunks.

    Files with zero chunks (empty content) are absent — callers union the
    empty-file set back in or left-join against the corpus ids.
    """
    return (
        manifest.select("file_id", "seq", "hash")
        .join(unique, "hash")
        .groupBy("file_id")
        .agg(
            # payloads are byte slices (a chunk boundary may split a
            # multibyte character), so reassembly concatenates BINARY and
            # decodes to string once at the end
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq", "payload"))),
                    lambda s: s["payload"],
                ),
                F.lit(b""),
                lambda acc, x: F.concat(acc, x),
            ).cast("string").alias("content")
        )
    )


def verify_roundtrip(corpus: DataFrame, manifest: DataFrame,
                     unique: DataFrame) -> DataFrame:
    """Rows where reconstruction does NOT reproduce content_sha256 —
    empty result = invariant holds. Empty files compare against ''."""
    rebuilt = reconstruct(manifest, unique)
    joined = corpus.select("file_id", "content_sha256").join(
        rebuilt, "file_id", "left"
    )
    return joined.where(
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
        != F.col("content_sha256")
    )
