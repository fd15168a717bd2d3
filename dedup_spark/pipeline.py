"""End-to-end near-dup pipeline with checkpoint/resume + per-stage metrics.

Stage DAG (north_star):
  corpus → signatures → candidates (LSH) → edges (verify) → clusters (CC)

Every stage can checkpoint to ``workdir/<stage>`` (parquet + _SUCCESS);
``resume=True`` skips any stage whose checkpoint exists — the reference's
error-latch/drain protocol (writer.go:380-388) becomes idempotent
stage-overwrite + skip-if-done (SURVEY.md §2.7). A ``metrics`` table
records per-stage, per-output-file lineage (rows, bytes, wall_ms).

Storage: plain parquet directories in the sandbox; the same API writes
Iceberg tables when an iceberg-spark-runtime jar + catalog are configured
(no Maven access here — SURVEY.md §7 environment facts).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DedupConfig


class Checkpointer:
    def __init__(self, spark: SparkSession, workdir: str | None):
        self.spark = spark
        self.workdir = workdir
        if workdir:
            os.makedirs(workdir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def has(self, stage: str) -> bool:
        return bool(self.workdir) and os.path.exists(
            os.path.join(self._path(stage), "_SUCCESS")
        )

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def write(self, stage: str, df: DataFrame, t0: float) -> DataFrame:
        """Materialize df, record lineage metrics, return the re-read frame
        (so downstream plans start from the checkpoint, cutting lineage)."""
        path = self._path(stage)
        df.write.mode("overwrite").parquet(path)
        wall_ms = int((time.time() - t0) * 1000)
        out = self.spark.read.parquet(path)
        lineage = (
            out.groupBy(F.input_file_name().alias("file"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        meta = {
            "stage": stage,
            "wall_ms": wall_ms,
            "rows": int(sum(r["rows"] for r in lineage)),
            "files": [
                {
                    "file": os.path.basename(r["file"]),
                    "rows": int(r["rows"]),
                    "bytes": os.path.getsize(
                        os.path.join(path, os.path.basename(r["file"]))
                    ) if os.path.exists(
                        os.path.join(path, os.path.basename(r["file"]))
                    ) else None,
                }
                for r in lineage
            ],
        }
        with open(os.path.join(self.workdir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(meta) + "\n")
        return out


def run_pipeline(
    corpus: DataFrame,
    cfg: DedupConfig | None = None,
    workdir: str | None = None,
    resume: bool = True,
    content_col: str = "content",
    id_col: str = "file_id",
) -> dict[str, DataFrame]:
    """Run (or resume) the full near-dup pipeline; returns all stage frames."""
    from .operators.cluster import cluster_assignments
    from .operators.lsh import candidate_pairs
    from .operators.signatures import compute_signatures
    from .operators.verify import verify_pairs

    cfg = cfg or DedupConfig()
    spark = corpus.sparkSession
    ckpt = Checkpointer(spark, workdir)

    def stage(name: str, build):
        t0 = time.time()
        if resume and ckpt.has(name):
            return ckpt.read(name)
        df = build()
        if workdir:
            return ckpt.write(name, df, t0)
        # no checkpoint dir: persist multi-consumer stages so the
        # chunk+signature scan runs once, not once per downstream action.
        # DISK_ONLY: deserialized in-heap caching of the array-heavy
        # signature rows caused measurable GC thrash (24s GC in one
        # downstream stage at 5 GB); the local dir is tmpfs so "disk"
        # reads are page-cache speed.
        from pyspark import StorageLevel

        return df.persist(StorageLevel.DISK_ONLY)

    # signatures carry the distinct shingle sets too — ONE corpus scan
    # feeds both LSH banding and exact-Jaccard verification.
    signatures = stage(
        "signatures",
        lambda: compute_signatures(corpus, cfg, content_col, id_col),
    )
    shingles = signatures.select("file_id", "shingles")
    pairs = stage("candidates", lambda: candidate_pairs(signatures, cfg))

    def build_edges():
        from .operators.verify import apply_lcs_gate

        e = verify_pairs(pairs, signatures, shingles, cfg)
        return apply_lcs_gate(e, corpus, cfg, content_col, id_col)

    edges = stage("edges", build_edges)
    clusters = stage(
        "clusters",
        lambda: cluster_assignments(
            corpus.select(F.col(id_col).alias("file_id")),
            edges.where("verified"),
        ),
    )
    return {
        "signatures": signatures,
        "shingles": shingles,
        "candidates": pairs,
        "edges": edges,
        "clusters": clusters,
    }
