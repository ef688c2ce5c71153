"""Per-job profile of one catalog query (guide §1: measure first).

Runs a query from catalog.queries() in a fresh session with the Spark
event log enabled, labels nothing (the catalog's own jobs appear as-is),
then parses the event log into a job-level timing table: job id, wall
seconds, stage count, task count, and the callsite that submitted it.

Usage:  python tools/profile_query.py <query_name> [sf_dir] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])

    import shutil

    log_dir = f"/tmp/profile_eventlogs_{name}"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"profile-{name}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{log_dir}")
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from ai_vector_database_converstion_from_pdf_spark import catalog

    qs = catalog.queries()
    fn = qs[name]
    # warmup action (mirrors bench.py)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    marks = []
    for rep in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        marks.append((rep, t0, dt))
        print(f"## rep {rep}: {dt:.3f}s ({n} rows)", file=sys.stderr)
    spark.stop()

    # parse the event log
    logs = []
    for root, _dirs, files in os.walk(log_dir):
        for f in files:
            if not f.startswith(".") and "appstatus" not in f:
                logs.append(os.path.join(root, f))
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for lf in logs:
        with open(lf) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    jobs[jid] = {
                        "t0": ev["Submission Time"],
                        "callsite": props.get("callSite.short", ""),
                        "desc": props.get("spark.job.description", ""),
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                        "ntasks": sum(s.get("Number of Tasks", 0) for s in ev.get("Stage Infos", [])),
                    }
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si.get("Stage Name", ""),
                        "ntasks": si.get("Number of Tasks", 0),
                        "ms": (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                        if si.get("Submission Time")
                        else 0,
                    }

    rows = []
    for jid, j in sorted(jobs.items()):
        if "t1" not in j:
            continue
        wall = (j["t1"] - j["t0"]) / 1000.0
        # longest stage for attribution
        best = max(
            (stages.get(s, {}) for s in j["stages"]),
            key=lambda s: s.get("ms", 0),
            default={},
        )
        rows.append((jid, wall, j["ntasks"], j["desc"] or j["callsite"], best.get("name", "")[:60]))
    total = sum(r[1] for r in rows)
    print(f"jobs={len(rows)} sum_job_wall={total:.2f}s")
    for jid, wall, ntasks, what, stg in rows:
        if wall >= 0.05:
            print(f"  job {jid:4d} {wall:7.2f}s tasks={ntasks:4d}  {what[:70]}  | {stg}")
    # gaps between jobs = driver-side time
    ordered = sorted((j["t0"], j.get("t1", j["t0"])) for j in jobs.values())
    gap = 0.0
    for (a0, a1), (b0, b1) in zip(ordered, ordered[1:]):
        if b0 > a1:
            gap += (b0 - a1) / 1000.0
    print(f"driver-side gap between jobs: {gap:.2f}s")


if __name__ == "__main__":
    main()
