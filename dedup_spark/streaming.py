"""Incremental / streaming near-dup detection (SURVEY.md §2.7).

The reference is a single-pass stream with bounded dedup state; the Spark
mapping is batch-over-files plus an **incremental mode**: process only new
corpus rows, join their signatures against the checkpointed signature
state, and append to the edge state. A thin Structured Streaming wrapper
(``stream_corpus``) feeds micro-batches of new files through the same
incremental update via ``foreachBatch`` — one code path for batch,
incremental, and streaming.

State layout under ``state_dir`` (APPEND-ONLY — at 100 TB with daily
appends, per-batch write volume must scale with the batch, never the
corpus, so committed batch partitions are immutable):

  signatures/batch_id=K/   this batch's signature+shingle rows
  edges/batch_id=K/        verified representative-level edges discovered
                           by this batch (compact — the within-group
                           connectivity is derivable from signatures and
                           is never materialized as state)
  metrics.jsonl            per-batch lineage: rows, pairs, dropped buckets

Each batch writes ONLY its own two partition directories; replaying a
batch id (Structured Streaming restart) overwrites those same two dirs
and nothing else, so the fold is idempotent. The edges partition is
written last and acts as the batch commit marker.

Skew + contraction parity with the batch path (operators/lsh.py +
operators/groups.py): candidate pairs are generated between signature
GROUP REPRESENTATIVES only — one new exact copy of an M-member
identical-signature group emits one star edge, not M pairs — and band
buckets beyond ``max_bucket * salt`` (counted over distinct signatures)
are excluded WITH LOGGED METRICS, the same no-silent-truncation rule the
batch path follows. Only groups first seen in this batch pair against the
rep universe: a pre-existing group was already paired against every group
older than itself when it first appeared, so old-vs-old work is never
repeated and per-batch cost scales with the batch.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .config import DedupConfig
from .operators.groups import group_star_pairs, sketch_groups, within_group_pairs
from .operators.lsh import band_buckets
from .operators.verify import verify_pairs


def _batch_dirs(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = re.fullmatch(r"batch_id=(\d+)", name)
        if m and os.path.exists(os.path.join(path, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def _footer_rows(path: str) -> int:
    """Row count from parquet footers — driver-side metadata, no Spark job."""
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(path, name)).metadata.num_rows
    return total


def incremental_update(new_corpus: DataFrame, state_dir: str,
                       cfg: DedupConfig | None = None,
                       content_col: str = "content",
                       id_col: str = "file_id",
                       batch_id: int | None = None) -> dict[str, DataFrame]:
    """Fold a batch of NEW files into the dedup state.

    ``batch_id=None`` assigns the next free id; passing an explicit id
    (the Structured Streaming micro-batch id) makes replay idempotent —
    a batch whose edges partition already exists is skipped outright, and
    a half-written batch (signatures committed, edges missing) is
    recomputed into the same partition dirs.
    """
    from .operators.signatures import compute_signatures

    cfg = cfg or DedupConfig()
    spark = new_corpus.sparkSession
    sig_path = os.path.join(state_dir, "signatures")
    edge_path = os.path.join(state_dir, "edges")

    done = set(_batch_dirs(edge_path))
    if batch_id is None:
        existing = _batch_dirs(sig_path)
        batch_id = (existing[-1] + 1) if existing else 0
    elif batch_id in done:
        return _state_frames(spark, state_dir)  # replayed batch: no-op

    sig_part = os.path.join(sig_path, f"batch_id={batch_id}")
    edge_part = os.path.join(edge_path, f"batch_id={batch_id}")

    # 1. this batch's signatures → its OWN partition dir. Prior batches'
    # files are never opened for write (append-only state).
    new_sigs = compute_signatures(new_corpus, cfg, content_col, id_col)
    new_sigs.write.mode("overwrite").parquet(sig_part)

    all_sigs = spark.read.parquet(sig_path)
    groups = sketch_groups(all_sigs.drop("batch_id"))

    # 2. group-contract the pair surface: one signature-group
    # representative carries the group everywhere (batch-path parity —
    # operators/groups.py). Groups containing any pre-batch member were
    # already paired when they first appeared; only groups born in this
    # batch generate candidates.
    flagged = groups.join(all_sigs.select("file_id", "batch_id"), "file_id")
    w = Window.partitionBy("g1", "g2")
    has_old = F.max(
        F.when(F.col("batch_id") != batch_id, 1).otherwise(0)
    ).over(w)
    born_now_reps = (
        flagged.withColumn("has_old", has_old)
        .where((F.col("has_old") == 0) & (F.col("file_id") == F.col("rep")))
        .select("file_id")
    )
    rep_sigs = all_sigs.drop("batch_id").join(
        groups.where(F.col("file_id") == F.col("rep")).select("file_id"),
        "file_id",
    )

    # 3. band join: new-group reps vs the rep universe, bucket-capped over
    # DISTINCT signatures with the batch path's no-silent-truncation rule.
    salt_cap = cfg.max_bucket * max(1, cfg.salt)
    rep_b = band_buckets(rep_sigs, cfg)
    sizes = rep_b.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_size")
    )
    ok_b = rep_b.join(
        sizes.where(F.col("bucket_size") <= salt_cap).drop("bucket_size"),
        ["band_id", "band_hash"],
    )
    new_b = band_buckets(
        rep_sigs.join(born_now_reps, "file_id"), cfg
    ).select("band_id", "band_hash", F.col("file_id").alias("new_id"))
    pairs = (
        new_b.join(ok_b, ["band_id", "band_hash"])
        .where(F.col("file_id") != F.col("new_id"))
        .select(
            F.least("file_id", "new_id").alias("src"),
            F.greatest("file_id", "new_id").alias("dst"),
        )
        .distinct()
    )
    shingles = rep_sigs.select("file_id", "shingles")
    rep_edges = verify_pairs(pairs, rep_sigs, shingles, cfg).where("verified")

    # 4. commit edges (the batch marker), then the lineage/skew metrics —
    # same dropped-bucket surface as operators/lsh.py candidate_pairs.
    rep_edges.write.mode("overwrite").parquet(edge_part)
    dropped = sizes.where(F.col("bucket_size") > salt_cap).agg(
        F.count("*").alias("dropped_buckets"),
        F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("dropped_rows"),
        F.coalesce(F.max("bucket_size"), F.lit(0)).alias("max_bucket_size"),
    ).first()
    meta = {
        "batch_id": batch_id,
        "new_rows": _footer_rows(sig_part),
        "new_edges": _footer_rows(edge_part),
        "dropped_buckets": int(dropped["dropped_buckets"]),
        "dropped_rows": int(dropped["dropped_rows"]),
        "max_bucket_size": int(dropped["max_bucket_size"]),
    }
    with open(os.path.join(state_dir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(meta) + "\n")

    return _state_frames(spark, state_dir)


def _state_frames(spark: SparkSession, state_dir: str) -> dict[str, DataFrame]:
    sigs = spark.read.parquet(os.path.join(state_dir, "signatures"))
    compact = spark.read.parquet(os.path.join(state_dir, "edges"))
    return {
        "signatures": sigs,
        "edges_compact": compact,
        # member-level verified pair surface (lazy, quadratic in group
        # sizes — audits only, parity with run_pipeline()["edges"])
        "edges": expanded_edges(spark, state_dir),
    }


def expanded_edges(spark: SparkSession, state_dir: str) -> DataFrame:
    """Member-level verified pair surface from compact state: stored rep
    edges fan out through signature-group membership, plus all
    within-group (jaccard exactly 1) pairs.

    Expansion joins endpoints by group MEMBERSHIP, not rep-ness: a stored
    endpoint is always some member of its group, but need not remain the
    group minimum once later batches add smaller file_ids."""
    sigs = spark.read.parquet(os.path.join(state_dir, "signatures"))
    rep_edges = spark.read.parquet(os.path.join(state_dir, "edges"))
    groups = sketch_groups(sigs.drop("batch_id"))
    key = groups.select("file_id", "g1", "g2")
    mem = groups.select("g1", "g2", F.col("file_id").alias("member"))
    cross = (
        rep_edges.drop("batch_id")
        .join(key.withColumnsRenamed(
            {"file_id": "src", "g1": "a1", "g2": "a2"}), "src")
        .join(key.withColumnsRenamed(
            {"file_id": "dst", "g1": "b1", "g2": "b2"}), "dst")
        .join(mem.withColumnsRenamed(
            {"g1": "a1", "g2": "a2", "member": "ma"}), ["a1", "a2"])
        .join(mem.withColumnsRenamed(
            {"g1": "b1", "g2": "b2", "member": "mb"}), ["b1", "b2"])
        .select(
            F.least("ma", "mb").alias("src"),
            F.greatest("ma", "mb").alias("dst"),
            "hamming",
            "jaccard",
            "verified",
        )
    )
    return cross.unionByName(within_group_pairs(groups))


def current_clusters(spark: SparkSession, state_dir: str) -> DataFrame:
    """Connected components over the compact state: group star edges
    (derived from signatures — never stored) + verified rep edges."""
    from .operators.cluster import cluster_assignments

    sigs = spark.read.parquet(os.path.join(state_dir, "signatures"))
    rep_edges = spark.read.parquet(os.path.join(state_dir, "edges"))
    groups = sketch_groups(sigs.drop("batch_id"))
    cluster_input = group_star_pairs(groups).unionByName(
        rep_edges.select("src", "dst")
    )
    return cluster_assignments(sigs.select("file_id"), cluster_input)


def stream_corpus(spark: SparkSession, input_dir: str, state_dir: str,
                  cfg: DedupConfig | None = None,
                  checkpoint_dir: str | None = None):
    """Structured Streaming wrapper: watch ``input_dir`` for new corpus
    parquet files; each micro-batch folds into the dedup state via
    ``incremental_update``. The streaming batch id keys the state
    partitions, so a restart-replayed batch is a no-op (idempotent
    exactly-once fold). Returns the StreamingQuery."""
    cfg = cfg or DedupConfig()
    schema = spark.read.parquet(input_dir).schema  # infer once

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_update(batch_df, state_dir, cfg, batch_id=batch_id)

    return (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(fold)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(state_dir, "_stream_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
