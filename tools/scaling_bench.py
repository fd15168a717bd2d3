"""Scaling-efficiency evidence (north_rule: throughput scaling >= 0.8 from
N to 4N executors; sandbox protocol per driver instruction: identical job at
local[8] vs local[32] on identical input, partitions pinned to 4x cores,
median of R repeats). Each measurement runs in a fresh subprocess so every
JVM starts cold and sessions never share state.

Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "__REPO__")
cores = int(sys.argv[1]); n_files = int(sys.argv[2])
from dedup_spark.config import DedupConfig
from dedup_spark.pipeline import run_pipeline
from dedup_spark.session import get_spark
from dedup_spark.synth import corpus_df

spark = get_spark("scale", cores=cores, shuffle_partitions=cores * 4)
spark.sparkContext.setLogLevel("ERROR")
corpus = corpus_df(spark, n_files, seed=42, partitions=cores * 4).cache()
n = corpus.count()
t0 = time.time()
res = run_pipeline(corpus, DedupConfig())
n_edges = res["edges"].where("verified").count()
n_clusters = res["clusters"].select("cluster_id").distinct().count()
wall = time.time() - t0
print(json.dumps({"cores": cores, "wall": wall, "files_per_sec": n / wall,
                  "n": n, "edges": n_edges, "clusters": n_clusters}))
spark.stop()
"""


def run_once(cores: int, n_files: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.replace("__REPO__", REPO),
         str(cores), str(n_files)],
        capture_output=True, text=True, timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_files = int(os.environ.get("SCALE_N_FILES", "10000"))
    reps = int(os.environ.get("SCALE_REPS", "3"))
    results = {8: [], 32: []}
    for rep in range(reps):
        for cores in (8, 32):
            r = run_once(cores, n_files)
            results[cores].append(r)
            print(f"rep{rep} local[{cores}]: {r['wall']:.1f}s "
                  f"{r['files_per_sec']:.0f} files/s", file=sys.stderr)
    med8 = statistics.median(r["files_per_sec"] for r in results[8])
    med32 = statistics.median(r["files_per_sec"] for r in results[32])
    eff = (med32 / med8) / 4
    sanity = {
        (r["edges"], r["clusters"]) for rs in results.values() for r in rs
    }
    summary = {
        "n_files": n_files,
        "reps": reps,
        "files_per_sec_local8": round(med8, 1),
        "files_per_sec_local32": round(med32, 1),
        "speedup_8_to_32": round(med32 / med8, 3),
        "scaling_efficiency": round(eff, 3),
        "deterministic_output": len(sanity) == 1,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE.md — measured baseline + scaling evidence

Protocol (BASELINE.md north-rule targets): identical end-to-end near-dup
pipeline (CDC chunk → MinHash/SimHash signatures → LSH → exact-Jaccard
verify → connected components) on an identical deterministic synthetic
source-code corpus (seed 42, n={n_files}), run at two parallelism levels in
fresh JVMs, `spark.sql.shuffle.partitions = 4 × cores`, median of {reps}.

| config | files/sec (median) |
|---|---|
| local[8]  | {med8:.1f} |
| local[32] | {med32:.1f} |

- speedup 8→32 cores: **{med32 / med8:.2f}×** (ideal 4×)
- scaling efficiency: **{eff:.3f}** (north-rule target ≥ 0.8)
- output determinism across all runs (edges, clusters): {len(sanity) == 1}

Raw runs:
```json
{json.dumps(results, indent=2)}
```

## Reference-shaped microbench (10 MiB + injected dups, chunker kernel)

See `tools/kernel_bench.py` output in this file's git history / BENCH logs.
""")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
