"""Bench a SUBSET of the headline queries at an arbitrary SF dir —
the sf1 scaling datapoint VERDICT r11 #5 asks for, without touching
bench.py (the driver contract). Methodology matches bench.py exactly:
noop sink, min-of-N, per-query GC settle, spin-ms bracketing; rows land
in BENCH_HISTORY.jsonl with the real sf so bench_diff keeps them apart.

Usage:
  python scripts/bench_subset.py --sf /tmp/sfdata_x10 --sf-label 1.0 \
      [--runs 2] [--queries q157 q101 ...]   (default: 30 slowest from
      the most recent sf0.1 history row)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def _slowest_from_history(n: int) -> list[str]:
    rows = [
        json.loads(ln)
        for ln in (ROOT / "BENCH_HISTORY.jsonl").read_text().splitlines()
        if ln.strip()
    ]
    last = [r for r in rows if r.get("sf") == 0.1][-1]
    return [k for k, _ in sorted(last["queries"].items(), key=lambda kv: -kv[1])[:n]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True, help="data dir")
    ap.add_argument("--sf-label", type=float, required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    from bench import _append_history, _spin_ms
    from job_etl_spark.queries import registry
    from job_etl_spark.session import get_spark

    names = args.queries or _slowest_from_history(args.top)
    spark = get_spark("jobspark-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    spark.range(1 << 20).selectExpr("sum(id * 2) AS s").write.mode(
        "overwrite"
    ).format("noop").save()

    spins = [_spin_ms()]
    import gc as _gc

    jvm_gc = spark.sparkContext._jvm.System.gc
    timings: dict[str, float] = {}
    for qi, name in enumerate(names):
        if qi and qi % 25 == 0:
            spins.append(_spin_ms())
        q = reg[name]
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            q.fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}", flush=True)
        _gc.collect()
        jvm_gc()

    result = {
        "metric": "jobspark subset wall-clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": args.sf_label,
        "spin_ms": spins + [_spin_ms()],
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }
    print(json.dumps(result))
    _append_history(result, args.runs)
    spark.stop()


if __name__ == "__main__":
    main()
