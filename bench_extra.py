"""Per-query measurement harness for the optimization rounds (guide §1).

NOT the driver's bench: bench.py is frozen for measurement. This tool
times an arbitrary subset of the declared queries at any SF dir with the
noop sink (guide §1.4), optionally dumps .explain("formatted") to
plans/<tag>/, and prints one JSON line per run so before/after numbers
can be cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--explain TAG] [query ...]

With no query names: runs every declared query (same order as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--explain", default=None,
                    help="dump plans to plans/<TAG>/<query>.txt")
    ap.add_argument("--count", action="store_true",
                    help="also count() each result (rows)")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from dedup_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    names = args.queries or list(qs)
    timings: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    for rep in range(args.reps):
        for name in names:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            timings.setdefault(name, []).append(round(time.time() - t0, 3))
            if args.explain and rep == 0:
                os.makedirs(f"plans/{args.explain}", exist_ok=True)
                with open(f"plans/{args.explain}/{name}.txt", "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            if args.count and rep == 0:
                rows[name] = df.count()
        # fresh caches between reps so every rep measures the same thing
        if rep < args.reps - 1:
            entry_mod.release_caches()
    out = {"sf": args.sf, "cpus": cpus, "timings": timings}
    if rows:
        out["rows"] = rows
    entry_mod.release_caches()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
