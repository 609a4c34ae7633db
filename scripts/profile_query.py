"""Per-job/per-stage breakdown for one or more queries.

Runs each query to the noop sink in a bench-config session with the UI
enabled, then reads the UI REST API: per-job wall-clock, stage task
counts/times, and the driver-side gaps between jobs (planning/collect
overhead that no stage accounts for). Guide §1 companion to
scripts/time_query.py.

Usage: python scripts/profile_query.py q158 q101 [--sf DIR] [--runs 2]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _parse_ts(s: str) -> float:
    # "2026-08-17T12:34:56.789GMT"
    return dt.datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession

    from job_etl_spark.queries import registry
    from job_etl_spark.session import _default_driver_mem

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("jobspark-profile")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", os.environ.get("JOBSPARK_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("JOBSPARK_DRIVER_MEM") or _default_driver_mem())
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "http://localhost:4040/api/v1"
    app_id = spark.sparkContext.applicationId
    reg = registry()

    # warmup (matches time_query.py)
    reg["q01_pricing_summary"].fn(spark, args.sf).write.format("noop").mode("overwrite").save()

    for prefix in args.queries:
        from _resolve import resolve_query

        name = resolve_query(reg, prefix)
        best, best_marks = None, None
        for _ in range(args.runs):
            jobs_before = {j["jobId"] for j in _get(f"{base}/applications/{app_id}/jobs")}
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            reg[name].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            jobs = [
                j
                for j in _get(f"{base}/applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            if best is None or wall < best:
                best, best_marks = wall, jobs
        jobs = sorted(best_marks, key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {best:.3f}s, {len(jobs)} jobs ===")
        prev_end = None
        job_sum = 0.0
        for j in jobs:
            st, en = _parse_ts(j["submissionTime"]), _parse_ts(j["completionTime"])
            gap = (st - prev_end) if prev_end is not None else 0.0
            prev_end = en
            job_sum += en - st
            print(
                f"  job {j['jobId']}: {en - st:6.3f}s  gap_before {gap:6.3f}s  "
                f"stages={len(j['stageIds'])} tasks={j['numTasks']}  {j.get('description','')[:60]}"
            )
        print(f"  sum(job wall) {job_sum:.3f}s; driver-side remainder {best - job_sum:.3f}s")
        # stage detail for the longest jobs
        stages = _get(f"{base}/applications/{app_id}/stages?status=complete")
        sid_map = {s["stageId"]: s for s in stages}
        for j in jobs:
            for sid in sorted(j["stageIds"]):
                s = sid_map.get(sid)
                if not s:
                    # listed in the job but never ran (AQE-skipped /
                    # reused-exchange stages) — label instead of dur=-1
                    print(f"    stage {sid}: skipped")
                    continue
                if s.get("completionTime") and s.get("firstTaskLaunchedTime"):
                    dur = _parse_ts(s["completionTime"]) - _parse_ts(
                        s["firstTaskLaunchedTime"]
                    )
                    dur_s = f"{dur:6.3f}s"
                else:
                    dur_s = "  (no tasks)"
                print(
                    f"    stage {sid}: {dur_s} tasks={s['numCompleteTasks']} "
                    f"in={s['inputBytes']} sr={s['shuffleReadBytes']} sw={s['shuffleWriteBytes']} "
                    f"{s['name'][:50]}"
                )

    spark.stop()


if __name__ == "__main__":
    main()
