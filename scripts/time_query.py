"""Time individual queries at a given SF: python scripts/time_query.py q27 q29 [--sf DIR] [--n 3].

Dev-loop companion to bench.py — same session config, per-query min-of-N.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    from job_etl_spark.session import get_spark
    from job_etl_spark.queries import registry

    spark = get_spark()
    reg = registry()
    # warm the JVM/JIT + parquet footer cache so numbers match bench.py's
    # steady state (it runs a long suite; first queries absorb warmup)
    reg["q01_pricing_summary"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    for prefix in args.queries:
        from _resolve import resolve_query

        name = resolve_query(reg, prefix)
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            reg[name].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        print(f"{name}: min={min(times):.3f}s runs={[round(t, 3) for t in times]}")


if __name__ == "__main__":
    main()
