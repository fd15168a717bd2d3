"""Incremental / streaming near-dup detection (SURVEY.md §2.7).

The reference is a single-pass stream with bounded dedup state; the Spark
mapping is batch-over-files plus an **incremental mode**: process only new
corpus rows, join their signatures against the checkpointed signature
table, and append to the edge/cluster state. A thin Structured Streaming
wrapper (``stream_corpus``) feeds micro-batches of new files through the
same incremental update via ``foreachBatch`` — one code path for batch,
incremental, and streaming.

State layout under ``state_dir``:
  signatures/   cumulative signature+shingle table (parquet)
  edges/        cumulative verified edge list
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DedupConfig
from .operators.lsh import band_buckets
from .operators.verify import verify_pairs


def _exists(spark: SparkSession, path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def incremental_update(new_corpus: DataFrame, state_dir: str,
                       cfg: DedupConfig | None = None,
                       content_col: str = "content",
                       id_col: str = "file_id") -> dict[str, DataFrame]:
    """Fold a batch of NEW files into the dedup state.

    Candidates are restricted to band buckets containing at least one new
    file — old-vs-old pairs are never re-examined, so per-batch cost scales
    with the batch, not the corpus (the reference's bounded-window dedup
    generalized: state is the signature table instead of a block ring).
    """
    from .operators.signatures import compute_signatures

    cfg = cfg or DedupConfig()
    spark = new_corpus.sparkSession
    sig_path = os.path.join(state_dir, "signatures")
    edge_path = os.path.join(state_dir, "edges")

    new_sigs = compute_signatures(new_corpus, cfg, content_col, id_col)
    if _exists(spark, sig_path):
        old_sigs = spark.read.parquet(sig_path)
        all_sigs = old_sigs.unionByName(new_sigs)
    else:
        old_sigs = None
        all_sigs = new_sigs

    # band join: buckets of ALL signatures, but keep only buckets touched
    # by a new file; pair (new x all) within bucket. Skew guard aligned
    # with the batch path (operators/lsh.py + groups.py): bucket size is
    # counted over DISTINCT signatures (one representative per identical
    # signature group — identical files share every band value), so a
    # mega-cluster of exact copies counts as ONE and keeps matching, while
    # a true boilerplate band (many distinct signatures colliding) beyond
    # max_bucket * salt is excluded from pair generation.
    salt_cap = cfg.max_bucket * max(1, cfg.salt)
    all_b = band_buckets(all_sigs, cfg)
    rep_b = band_buckets(
        all_sigs.dropDuplicates(["minhash"]), cfg
    )
    sizes = rep_b.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_size")
    )
    all_b = all_b.join(
        sizes.where(F.col("bucket_size") <= salt_cap).drop("bucket_size"),
        ["band_id", "band_hash"],
    )
    new_b = band_buckets(new_sigs, cfg).select(
        "band_id", "band_hash", F.col("file_id").alias("new_id")
    )
    pairs = (
        new_b.join(all_b, ["band_id", "band_hash"])
        .where(F.col("file_id") != F.col("new_id"))
        .select(
            F.least("file_id", "new_id").alias("src"),
            F.greatest("file_id", "new_id").alias("dst"),
        )
        .distinct()
    )
    shingles = all_sigs.select("file_id", "shingles")
    edges = verify_pairs(pairs, all_sigs, shingles, cfg).where("verified")

    # persist state. Order matters: the edge plan lazily reads the OLD
    # signature files, so edges must be materialized before sig_path is
    # overwritten; the union is staged to a _next dir first.
    tmp = sig_path + "_next"
    all_sigs.write.mode("overwrite").parquet(tmp)
    edges.write.mode("append").parquet(edge_path)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(sig_path)

    return {
        "signatures": spark.read.parquet(sig_path),
        "edges": spark.read.parquet(edge_path),
    }


def current_clusters(spark: SparkSession, state_dir: str) -> DataFrame:
    """Connected components over the cumulative edge state."""
    from .operators.cluster import cluster_assignments

    edge_path = os.path.join(state_dir, "edges")
    sig_path = os.path.join(state_dir, "signatures")
    edges = spark.read.parquet(edge_path)
    ids = spark.read.parquet(sig_path).select("file_id")
    return cluster_assignments(ids, edges)


def stream_corpus(spark: SparkSession, input_dir: str, state_dir: str,
                  cfg: DedupConfig | None = None,
                  checkpoint_dir: str | None = None):
    """Structured Streaming wrapper: watch ``input_dir`` for new corpus
    parquet files; each micro-batch folds into the dedup state via
    ``incremental_update``. Returns the StreamingQuery."""
    cfg = cfg or DedupConfig()
    schema = spark.read.parquet(input_dir).schema  # infer once

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_update(batch_df, state_dir, cfg)

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
