"""Per-phase wall-time attribution for the scaling study: runs the pipeline
stages one materialization at a time at a given core count and prints a JSON
line. Usage: python tools/phase_probe.py <cores> [corpus_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cores = int(sys.argv[1])
    corpus_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dedup_scale_corpus"

    from pyspark import StorageLevel
    from pyspark.sql import SparkSession

    from dedup_spark.config import DedupConfig
    from dedup_spark.session import _local_dir

    spark = (
        SparkSession.builder.appName("phase_probe")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.local.dir", _local_dir())
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(2 << 20))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from dedup_spark.operators.cluster import cluster_assignments
    from dedup_spark.operators.groups import (
        group_star_pairs, representative_ids, sketch_groups,
    )
    from dedup_spark.operators.lsh import candidate_pairs
    from dedup_spark.operators.signatures import compute_signatures
    from dedup_spark.operators.verify import verify_pairs

    cfg = DedupConfig()
    corpus = spark.read.parquet(corpus_dir)
    n = corpus.count()

    phases = {}
    t_all = time.time()

    t0 = time.time()
    signatures = compute_signatures(corpus, cfg, "content", "file_id").persist(
        StorageLevel.DISK_ONLY
    )
    signatures.count()
    phases["signatures"] = round(time.time() - t0, 2)

    t0 = time.time()
    groups = sketch_groups(signatures).persist(StorageLevel.DISK_ONLY)
    groups.count()
    phases["groups"] = round(time.time() - t0, 2)

    t0 = time.time()
    rep_sigs = signatures.join(representative_ids(groups), "file_id")
    pairs = candidate_pairs(rep_sigs, cfg).persist(StorageLevel.DISK_ONLY)
    n_pairs = pairs.count()
    phases["candidates"] = round(time.time() - t0, 2)

    t0 = time.time()
    shingles = rep_sigs.select("file_id", "shingles")
    edges = verify_pairs(pairs, rep_sigs, shingles, cfg).persist(
        StorageLevel.DISK_ONLY
    )
    n_edges = edges.where("verified").count()
    phases["edges"] = round(time.time() - t0, 2)

    t0 = time.time()
    cluster_input = group_star_pairs(groups).unionByName(
        edges.where("verified").select("src", "dst")
    )
    clusters = cluster_assignments(corpus.select("file_id"), cluster_input)
    n_clusters = clusters.select("cluster_id").distinct().count()
    phases["clusters"] = round(time.time() - t0, 2)

    wall = round(time.time() - t_all, 2)
    print(
        json.dumps(
            {
                "cores": cores,
                "n": n,
                "wall": wall,
                "phases": phases,
                "pairs": n_pairs,
                "edges": n_edges,
                "clusters": n_clusters,
                "files_per_sec": round(n / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
