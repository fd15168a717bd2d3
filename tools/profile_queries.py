"""Run declared queries with the Spark event log on; print per-query wall
and the event-log path + per-query t0 epoch-ms so tools/stage_metrics.py
can break a query into stages.

Usage: SPARK_CONF_DIR=/tmp/spark_conf python tools/profile_queries.py \
           --sf DIR query [query ...]
(the conf dir's spark-defaults.conf must set spark.eventLog.enabled/.dir)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("SPARK_CONF_DIR", "/tmp/spark_conf")
    os.makedirs("/tmp/spark_events", exist_ok=True)

    from dedup_spark.session import get_spark

    spark = get_spark("profile", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    marks = {}
    for rep in range(int(os.environ.get("PROFILE_REPS", "1"))):
      if rep:
          entry_mod.release_caches()
      for name in args.queries:
        spark.sparkContext.setJobDescription(name)
        t0 = int(time.time() * 1000)
        df = qs[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        marks[f"{name}#{rep}"] = {"t0_ms": t0, "wall": round(time.time() * 1000 - t0) / 1000}
    entry_mod.release_caches()
    spark.stop()
    print(json.dumps({"log": f"/tmp/spark_events/{app_id}", "marks": marks}))


if __name__ == "__main__":
    main()
