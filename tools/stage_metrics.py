"""Parse a spark event log: per-stage wall, taskSum, cpuSum, task count,
GC — only for stages completing after an epoch-ms threshold.

Usage: python tools/stage_metrics.py <eventlog_dir_or_file> [t0_ms]
"""
import json
import os
import sys


def load(path):
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith("events_") or name.startswith("eventlog_v2"):
                path = os.path.join(path, name)
                break
    with open(path) as f:
        for line in f:
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue


def main():
    path = sys.argv[1]
    t0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    agg = {}  # stage id -> metrics
    for ev in load(path):
        e = ev.get("Event")
        if e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            a = agg.setdefault(sid, {"run": 0, "cpu": 0, "gc": 0, "n": 0,
                                     "deser": 0, "fetch": 0})
            a["run"] += m.get("Executor Run Time", 0)
            a["cpu"] += m.get("Executor CPU Time", 0) / 1e6
            a["gc"] += m.get("JVM GC Time", 0)
            a["deser"] += m.get("Executor Deserialize Time", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            a["fetch"] += sr.get("Fetch Wait Time", 0)
            a["n"] += 1
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            if si.get("Completion Time", 0) < t0:
                agg.pop(si["Stage ID"], None)
                continue
            a = agg.setdefault(si["Stage ID"], {})
            a["name"] = si["Stage Name"][:55]
            a["wall"] = (si["Completion Time"] - si["Submission Time"]) / 1000
            a["start"] = (si["Submission Time"] - t0) / 1000 if t0 else 0
    print(f"{'sid':>4} {'start':>7} {'wall':>6} {'tasks':>5} {'runSum':>7} "
          f"{'cpuSum':>7} {'gcSum':>6} {'name'}")
    for sid in sorted(agg):
        a = agg[sid]
        if "name" not in a:
            continue
        print(f"{sid:>4} {a.get('start', 0):>7.2f} {a['wall']:>6.2f} "
              f"{a.get('n', 0):>5} {a.get('run', 0)/1000:>7.2f} "
              f"{a.get('cpu', 0)/1000:>7.2f} {a.get('gc', 0)/1000:>6.2f} "
              f"{a['name']}")


if __name__ == "__main__":
    main()
