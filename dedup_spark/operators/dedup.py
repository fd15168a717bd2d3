"""Stage 2: exact dedup over chunks — manifest, unique-chunk store, ratios.

Relational re-expression of the reference's hash-index probe
(/root/reference/writer.go:475-532):

* J1 first-occurrence flag: ``row_number() over (partition by hash order by
  file_id, seq) == 1`` — the ``_, ok := index[hash]`` probe (writer.go:482).
* J2 backref to latest match: ``lag(global_seq) over (partition by hash order
  by global_seq)`` — "Update hash to latest match" (writer.go:507-508).
* J3 bounded window (format 2, writer.go:541-543): hits farther than
  ``max_backref`` blocks are treated as new — a predicate, not a new join.

Scale notes: the only shuffle is on ``hash`` (well distributed by
construction — it IS a cryptographic hash, so no skew); AQE coalesces
partitions. No global sort is required: ordering is per-hash-group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_seq(chunks: DataFrame, seq_bits: int = 20) -> DataFrame:
    """Global stream position = file_id * 2^seq_bits + seq.

    The reference numbers blocks monotonically over one stream
    (writer.go:97); our corpus is the concatenation of per-file streams in
    file_id order. Encoding avoids a global row_number sort (which would be
    a single-partition bottleneck at 100 TB). seq_bits=20 allows 1M chunks
    per file.
    """
    # Fail loudly on overflow: a file with >= 2^seq_bits chunks would bleed
    # into the next file's range and silently corrupt first-occurrence
    # ordering and backref distances.
    guarded = F.when(
        F.col("seq") < F.lit(1 << seq_bits),
        (F.col("file_id").cast("long") * (1 << seq_bits)) + F.col("seq"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"with_global_seq: seq >= 2^{seq_bits} in file_id="),
                F.col("file_id").cast("string"),
                F.lit("; raise seq_bits"),
            )
        )
    )
    return chunks.withColumn("global_seq", guarded)


def build_manifest(chunks: DataFrame, max_backref: int | None = None) -> DataFrame:
    """Per-chunk dedup manifest: is_new + backref distance.

    ``is_new`` marks the globally-first occurrence of each hash (J1);
    ``backref`` is the distance (in global stream positions) to the most
    recent prior occurrence (J2), null for new chunks. With ``max_backref``,
    occurrences whose previous match is too far away are re-flagged new (J3,
    format-2 semantics writer.go:541-543).
    """
    chunks = with_global_seq(chunks)
    w = Window.partitionBy("hash").orderBy("global_seq")
    out = (
        chunks.withColumn("occ", F.row_number().over(w))
        .withColumn("prev_seq", F.lag("global_seq").over(w))
        .withColumn("backref", F.col("global_seq") - F.col("prev_seq"))
        .withColumn("is_new", F.col("occ") == 1)
    )
    if max_backref is not None:
        out = out.withColumn(
            "is_new", F.col("is_new") | (F.col("backref") > max_backref)
        )
    return out.drop("occ", "prev_seq")


def unique_chunks(manifest: DataFrame, corpus: DataFrame,
                  content_col: str = "content") -> DataFrame:
    """Payload store for first-occurrence chunks (the reference's data
    stream, writer.go:483-497) — payload recovered JVM-side by slicing the
    owning file's content; no bytes ever cross the Python boundary.
    """
    firsts = manifest.where("is_new").select("file_id", "offset", "length", "hash")
    return (
        firsts.join(corpus.select("file_id", content_col), "file_id")
        .select(
            "hash",
            # chunk offsets are BYTE offsets into the UTF-8 encoding, so the
            # slice must be byte-wise: substring over BINARY (char-based
            # substring corrupts payloads on multibyte content)
            F.expr(
                f"substring(cast({content_col} as binary),"
                " cast(offset + 1 as int), length)"
            ).alias("payload"),
        )
        # a manifest built with max_backref re-flags far re-occurrences as
        # new (J3); payloads for one hash are identical by construction, so
        # keep one — reconstruct's join on hash must see unique keys
        .dropDuplicates(["hash"])
    )


def dedup_stats(manifest: DataFrame) -> DataFrame:
    """A1/A2 aggregates: blocks, unique blocks, bytes, dedup ratio
    (writer_test.go:54-66 'removed' metric)."""
    return manifest.agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("n_unique"),
        F.sum("length").alias("total_bytes"),
        F.sum(F.when(F.col("is_new"), F.col("length")).otherwise(0)).alias(
            "unique_bytes"
        ),
        (1.0 - F.sum(F.when(F.col("is_new"), F.col("length")).otherwise(0))
         / F.sum("length")).alias("dedup_ratio"),
    )


def max_mem(
    manifest: DataFrame, read_data_bytes: bool = True, n_buckets: int = 256
) -> DataFrame:
    """A4 MaxMem — peak decoder memory via interval-overlap sweep
    (reader.go:324-349): each unique hash is live from its first to its
    last occurrence; answer = max running sum of (+size at first, -size
    after last) over stream order.

    The running sum is a **two-phase distributed prefix sum**, not a global
    ``Window.orderBy`` (which plans a single-partition sort — one task holds
    every event at 100 TB):

    1. deltas pre-aggregated per position (tie-order independence — two
       intervals meeting at one position must net out, not race);
    2. positions bucketed into ``n_buckets`` contiguous ranges by arithmetic
       on broadcast min/max bounds (deterministic, no sampling);
    3. per-bucket running sums via a window partitioned by bucket;
    4. per-bucket totals (tiny: ``n_buckets`` rows) turned into exclusive
       prefix offsets and broadcast-joined back.
    """
    spans = (
        with_global_seq(manifest)
        .groupBy("hash")
        .agg(
            F.min("global_seq").alias("first_seq"),
            F.max("global_seq").alias("last_seq"),
            F.first("length").alias("length"),
        )
    )
    delta = F.col("length") if read_data_bytes else F.lit(1)
    events = (
        spans.select(
            F.col("first_seq").alias("pos"), delta.cast("long").alias("delta")
        )
        .unionAll(
            spans.select(
                (F.col("last_seq") + 1).alias("pos"),
                (-delta).cast("long").alias("delta"),
            )
        )
        .groupBy("pos")
        .agg(F.sum("delta").alias("delta"))
    )
    bounds = events.agg(F.min("pos").alias("lo"), F.max("pos").alias("hi"))
    ev = events.crossJoin(F.broadcast(bounds))
    width = F.greatest(
        F.ceil((F.col("hi") - F.col("lo") + 1) / F.lit(n_buckets)), F.lit(1)
    )
    ev = ev.withColumn(
        "bucket", F.floor((F.col("pos") - F.col("lo")) / width)
    ).drop("lo", "hi")
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ev.withColumn("run", F.sum("delta").over(w_local))
    totals = local.groupBy("bucket").agg(
        F.sum("delta").alias("tot"), F.max("run").alias("local_max")
    )
    w_off = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.withColumn(
        "off", F.coalesce(F.sum("tot").over(w_off), F.lit(0).cast("long"))
    )
    # peak = max over buckets of (bucket offset + that bucket's local max);
    # no need to join back to the event rows at all
    return offs.agg(
        F.max(F.col("off") + F.col("local_max")).alias("max_mem")
    )
