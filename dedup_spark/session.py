"""SparkSession factory tuned for the sandbox (local mode) but configured
the way the job would run on a real cluster: AQE on, skew-join handling on,
Arrow enabled for the vectorized UDF stages.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Build (once per process) a zip of the dedup_spark package — the
    artifact a production job ships via ``spark-submit --py-files``
    (north_rule). Returned path is stable within a run."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(tempfile.gettempdir(),
                       f"dedup_spark_pkg_{os.getuid()}.zip")
    if not os.path.exists(out):
        tmp = out + f".{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, out)
    return out


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
    spark = builder.getOrCreate()
    # Ship the package to executor Python workers regardless of driver cwd —
    # the same thing `spark-submit --py-files dedup_spark.zip` does on a
    # real cluster. Without this, mapInArrow UDFs fail to unpickle when the
    # driver wasn't launched from the repo root.
    spark.sparkContext.addPyFile(package_zip())
    return spark
