"""Measure partition-scoped MOR compaction: cost tracks touched buckets.

The r9 probe (mor_normalize_probe.py) showed MOR WRITES are O(batch) but
compaction was still a full-base rewrite — the dominant amortized cost at
scale. This probe prices the r10 fix: a base bucketed by key hash
(``mor_init(buckets=N)``) compacts only the buckets the delta keys touch.

Two axes:

1. TOUCHED-BUCKET SCALING (fixed table size, fixed bucket count): deltas
   engineered to hit 1 / 4 / 16 / 32 of 32 buckets. Claim: compaction
   wall-clock grows with the touched-bucket count and the full-touch case
   is the flat layout's cost — the rewrite tracks the delta's bucket
   footprint, not the table.

2. TABLE GROWTH UNDER THE SIZING RULE (bucket count scales with the
   table, so a bucket stays constant-sized; delta touches a fixed 4
   buckets): flat compaction grows with the table; bucketed compaction
   stays ~flat. This is the 100 TB operating point — pick N so a bucket
   is a few GB, and an amortized compaction costs O(touched buckets),
   independent of table size.

Keys are routed to target buckets with the SAME xxhash64 expression the
store uses, so the probe measures the real layout path (tmp write +
per-bucket swap + delta clear), not a simulation.

Usage: python scripts/mor_compact_probe.py [--size 300000] [--batches 3]
Prints a table for SCALING.md; writes nothing outside a temp dir.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_table(spark, store, name: str, n: int, buckets: int | None):
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("a"),
        (F.col("id") * 0.5).alias("b"),
        F.col("id").alias("ts"),
    )
    store.write(name, df)
    store.mor_init(name, store.read(name), ["k"], buckets=buckets)


def delta_for_buckets(spark, store, name: str, n_buckets: int, targets, rows: int):
    """rows update-rows whose keys hash into the target buckets (the same
    assignment expression the store's layout uses)."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(store._mor_dir(name, "base"))
    meta = {"keys": ["k"], "buckets": n_buckets}
    keys = (
        base.select("k")
        .where(store._mor_bucket_expr(meta).isin(list(targets)))
        .limit(rows)
    )
    return keys.select(
        "k",
        F.lit("updated").alias("a"),
        F.lit(-1.0).alias("b"),
        F.lit(10**9).alias("ts"),
    )


def timed_compact(store, name: str) -> float:
    t0 = time.monotonic()
    n = store.mor_compact(name)
    dt = time.monotonic() - t0
    assert n > 0
    return dt


def measure(spark, store, name: str, n: int, buckets, n_buckets: int, targets,
            batches: int, delta_rows: int, trials: int = 2) -> float:
    """min-of-trials compaction time; the table is rebuilt per trial
    (a compaction consumes its deltas)."""
    best = float("inf")
    for t in range(trials):
        tname = f"{name}_{t}"
        make_table(spark, store, tname, n, buckets=buckets)
        for _ in range(batches):
            store.mor_upsert(
                tname, delta_for_buckets(spark, store, tname, n_buckets, targets, delta_rows)
            )
        best = min(best, timed_compact(store, tname))
        import shutil as _sh

        _sh.rmtree(store.path(tname), ignore_errors=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=300_000)
    ap.add_argument("--batches", type=int, default=3, help="deltas per compaction")
    ap.add_argument("--delta-rows", type=int, default=2_000)
    args = ap.parse_args()

    from job_etl_spark.session import get_spark

    spark = get_spark("jobspark-mor-compact-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="jobspark_compactprobe_")
    from job_etl_spark.pipeline.runner import TableStore

    store = TableStore(spark, work)
    try:
        print(f"# axis 1: touched-bucket scaling (size={args.size}, 32 buckets, "
              f"{args.batches} deltas x {args.delta_rows} rows, min of 2)")
        print("layout      touched  compact_s")
        for touched in (1, 4, 16, 32):
            dt = measure(spark, store, f"t_touch_{touched}", args.size, 32, 32,
                         list(range(touched)), args.batches, args.delta_rows)
            print(f"bucketed32  {touched:>7}  {dt:9.2f}", flush=True)
        dt = measure(spark, store, "t_flat_a1", args.size, None, 32,
                     list(range(32)), args.batches, args.delta_rows)
        print(f"flat        {'all':>7}  {dt:9.2f}", flush=True)

        print()
        print("# axis 2: table growth under the sizing rule (bucket stays "
              "constant-sized; delta touches 4 buckets; min of 2)")
        print("size      layout       buckets  compact_s")
        for n, b in ((args.size, 16), (args.size * 10, 160)):
            dt = measure(spark, store, f"t_rule_{n}", n, b, b, [0, 1, 2, 3],
                         args.batches, args.delta_rows)
            print(f"{n:<9} bucketed     {b:>7}  {dt:9.2f}", flush=True)
            dt = measure(spark, store, f"t_ruleflat_{n}", n, None, b,
                         list(range(b)), args.batches, args.delta_rows)
            print(f"{n:<9} flat         {'-':>7}  {dt:9.2f}", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
