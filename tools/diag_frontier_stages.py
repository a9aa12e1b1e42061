"""Diagnostic: per-stage task counts + times for the frontier pipeline.

Runs bench.frontier_throughput once at a given core count with Spark event
logging on, then parses the event log into a per-stage table (tasks, total
task time, max task time, stage wall). Serial stages (1 task) and skewed
stages (max >> mean) cap scaling efficiency — this pinpoints them.

Usage: python tools/diag_frontier_stages.py [cpus] [mult]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    evdir = f"/tmp/evlog_{cpus}"
    os.makedirs(evdir, exist_ok=True)
    for f in glob.glob(os.path.join(evdir, "*")):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)

    from crawler_spark.session import get_spark

    spark = get_spark(
        "frontier-diag",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    res = bench.frontier_throughput(spark, "/root/testdata/sf0.1", mult=mult)
    print(json.dumps(res))
    spark.stop()

    # Parse the event log: stage -> (name, tasks, sum task ms, max task ms,
    # wall ms from stage submit to complete).
    stages: dict[int, dict] = {}
    paths = [
        p
        for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
        if os.path.isfile(p)
        and "appstatus" not in os.path.basename(p)
        and not p.endswith(".crc")
        and not p.endswith(".zstd")
    ]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    d = stages.setdefault(sid, {"tasks": 0, "sum_ms": 0, "max_ms": 0})
                    d["name"] = si["Stage Name"].split("\n")[0]
                    d["n_tasks"] = si["Number of Tasks"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    d["wall_ms"] = (comp - sub) if sub and comp else None
                elif k == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    d = stages.setdefault(sid, {"tasks": 0, "sum_ms": 0, "max_ms": 0})
                    ti = ev.get("Task Info", {})
                    dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                    d["tasks"] += 1
                    d["sum_ms"] += dur
                    d["max_ms"] = max(d["max_ms"], dur)

    total_wall = sum(d.get("wall_ms") or 0 for d in stages.values())
    print(f"\n{'stage':>5} {'tasks':>5} {'wall_s':>8} {'sum_s':>8} {'max_s':>7}  name")
    for sid in sorted(stages):
        d = stages[sid]
        if not d.get("wall_ms"):
            continue
        print(
            f"{sid:>5} {d.get('n_tasks', d['tasks']):>5} "
            f"{(d['wall_ms'] or 0) / 1e3:>8.2f} {d['sum_ms'] / 1e3:>8.2f} "
            f"{d['max_ms'] / 1e3:>7.2f}  {d.get('name', '?')[:60]}"
        )
    print(f"total stage wall: {total_wall / 1e3:.2f}s  (cpus={cpus}, mult={mult})")


if __name__ == "__main__":
    main()
