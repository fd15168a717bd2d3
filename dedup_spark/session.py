"""SparkSession factory tuned for the sandbox (local mode) but configured
the way the job would run on a real cluster: AQE on, skew-join handling on,
Arrow enabled for the vectorized UDF stages.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "dedup_spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # partitions pinned to cores in local mode; a real cluster would use
        # 2-4x total executor cores and lean on AQE coalescing.
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
