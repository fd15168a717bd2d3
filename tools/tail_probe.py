"""One pinned run of the scaling-protocol child with event logs on;
prints a per-job timeline (wall + gaps) to attribute the fixed tail.

Usage: taskset -c 0-7 python tools/tail_probe.py 8 /tmp/dedup_scale_corpus
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cores = int(sys.argv[1])
corpus_path = sys.argv[2]

from pyspark.sql import SparkSession

from dedup_spark.config import DedupConfig
from dedup_spark.pipeline import run_pipeline
from dedup_spark.session import _local_dir, package_zip

os.makedirs("/tmp/spark_events", exist_ok=True)
spark = (SparkSession.builder.appName("tailprobe").master(f"local[{cores}]")
     .config("spark.sql.shuffle.partitions", os.environ.get("TP_SHUF", "32"))
     .config("spark.driver.memory", "48g")
     .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC -Xmn8g")
     .config("spark.local.dir", _local_dir())
     .config("spark.sql.execution.arrow.maxBytesPerBatch", str(2 << 20))
     .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
     .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
     .config("spark.sql.adaptive.enabled", "false")
     .config("spark.eventLog.enabled", "true")
     .config("spark.eventLog.dir", "/tmp/spark_events")
     .config("spark.eventLog.compress", "false")
     .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile(package_zip())
app_id = spark.sparkContext.applicationId
corpus = spark.read.parquet(corpus_path)
n = corpus.count()
run_pipeline(corpus.limit(400), DedupConfig())["clusters"].count()
t0 = time.time()
res = run_pipeline(corpus, DedupConfig(), corpus_path=corpus_path)
t_pipe = time.time()
nc = res["clusters"].select("cluster_id").distinct().count()
t_clusters = time.time()
ne = res["edges_rep"].where("verified").count()
wall = time.time() - t0
print(json.dumps({"cores": cores, "wall": round(wall, 2),
                  "plan_s": round(t_pipe - t0, 2),
                  "clusters_action_s": round(t_clusters - t_pipe, 2),
                  "edges_action_s": round(wall - (t_clusters - t0), 2),
                  "t0_epoch_ms": int(t0 * 1000),
                  "n": n, "edges": ne, "clusters": nc}))
spark.stop()

# ---- parse the event log ----
evdir = os.path.join("/tmp/spark_events", f"eventlog_v2_{app_id}")
evfile = None
for name in os.listdir(evdir):
    if name.startswith("events_"):
        evfile = os.path.join(evdir, name)
if evfile is None:
    sys.exit("no event file")
jobs = {}
stages = {}
with open(evfile) as f:
    for line in f:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": (props.get("spark.job.description")
                         or props.get("callSite.short") or "")[:90],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"][:60],
                "tasks": si["Number of Tasks"],
            }

t0ms = int(t0 * 1000)
prev_end = None
print("\n--- timed-section job timeline (s rel t0) ---", file=sys.stderr)
for jid in sorted(jobs):
    j = jobs[jid]
    if "end" not in j or j["end"] < t0ms:
        continue
    gap = (j["start"] - prev_end) / 1000 if prev_end else 0.0
    prev_end = j["end"]
    snames = "; ".join(
        f"{stages.get(s, {}).get('name', '?')}[{stages.get(s, {}).get('tasks', '?')}]"
        for s in j["stages"] if s in stages)
    print(f"job{jid:3d} {(j['start']-t0ms)/1000:7.2f} -> "
          f"{(j['end']-t0ms)/1000:7.2f}  dur={(j['end']-j['start'])/1000:6.2f}"
          f"  gap={gap:5.2f}  {j['desc']!r} :: {snames[:120]}",
          file=sys.stderr)
