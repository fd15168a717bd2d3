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

    Reassembly is a linear ``b"".join`` per file group (applyInPandas):
    a fold of JVM ``concat(acc, chunk)`` calls would copy the accumulator
    at every step — O(file_bytes² / chunk_size) write amplification, a
    100 TB-killer on multi-MB files. Payloads are byte slices (a chunk
    boundary may split a multibyte character), so the join happens on
    bytes and decodes to string once at the end.
    """
    import pandas as pd

    def assemble(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("seq")
        return pd.DataFrame(
            {
                "file_id": [int(pdf["file_id"].iloc[0])],
                "content_bin": [b"".join(bytes(p) for p in pdf["payload"])],
            }
        )

    return (
        manifest.select("file_id", "seq", "hash")
        .join(unique, "hash")
        .select("file_id", "seq", "payload")
        .groupBy("file_id")
        .applyInPandas(assemble, "file_id long, content_bin binary")
        .select(
            "file_id", F.col("content_bin").cast("string").alias("content")
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
