"""Sweep: for every headline query in the modules that still scan via
``table()``, measure base vs parallel_table-patched (round-robin
repartition of every single-split scan) — interleaved min-of-N in one
session. Output: per-query delta, sorted. Measurement only (monkeypatch);
real conversions are made surgically in the query source afterwards.

Usage: python scripts/parallel_scan_sweep.py [--n 3] [--sf DIR] [--mods relational,...]
"""

from __future__ import annotations

import argparse
import importlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

MODS = ["relational", "timeseries", "graphs", "domain", "observability"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mods", default=",".join(MODS))
    ap.add_argument("--queries", default="", help="comma list; default: all headline in mods")
    args = ap.parse_args()

    from job_etl_spark.session import get_spark
    from job_etl_spark.queries import registry
    from job_etl_spark import tables as T
    import bench

    spark = get_spark("parallel-scan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    mods = {m: importlib.import_module(f"job_etl_spark.queries.{m}") for m in args.mods.split(",")}
    # map query -> module object it lives in (by function module)
    def mod_of(fn):
        return fn.__module__.rsplit(".", 1)[-1]

    wanted = [q for q in args.queries.split(",") if q] or [
        n for n in bench.HEADLINE if mod_of(reg[n].fn) in mods
    ]

    def patched(on: bool):
        for m in mods.values():
            if hasattr(m, "table"):
                m.table = T.parallel_table if on else T.table

    # warmup
    reg["q01_pricing_summary"].fn(spark, args.sf).write.format("noop").mode("overwrite").save()

    import gc as _gc
    jvm_gc = spark.sparkContext._jvm.System.gc
    results = []
    for name in wanted:
        fn = reg[name].fn
        best = {"base": float("inf"), "par": float("inf")}
        for _ in range(args.n):
            for key, on in (("base", False), ("par", True)):
                patched(on)
                t0 = time.perf_counter()
                try:
                    fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                except Exception as e:  # noqa: BLE001
                    print(f"{name}/{key}: ERROR {e}", file=sys.stderr)
                    best[key] = float("nan")
                    break
                best[key] = min(best[key], time.perf_counter() - t0)
        patched(False)
        _gc.collect(); jvm_gc()
        d = best["base"] - best["par"]
        results.append((d, name, best["base"], best["par"]))
        print(f"{name}: base={best['base']:.3f} par={best['par']:.3f} delta={d:+.3f}", flush=True)

    print("\n=== sorted by win ===")
    for d, name, b, p in sorted(results, reverse=True):
        print(f"{d:+.3f}  {name}  {b:.3f} -> {p:.3f}")
    tot = sum(d for d, *_ in results if d == d)
    print(f"total delta: {tot:+.2f}s over {len(results)} queries")


if __name__ == "__main__":
    main()
