"""Measure the enricher's write amplification: COW full rewrite vs
O(pending) MOR delta (r9 verdict #2, landed r10).

The reference's enricher is a keyed point-UPDATE of the pending rows only
(services/enricher/db_operations.py:140-176,244-282 — S6/S7 scans select
the pending subset). The engine's COW path instead recomputes
whole-table withColumn stages and rewrites staging; ``run_enrich(
mor=True)`` restores the reference's shape — enrich the pending subset,
land one delta carrying just the enricher columns with per-statement
OVERWRITE classes.

Method: seed staging at N rows of which a FIXED P are pending (status
'not_tried', empty skills), then time one ``run_enrich`` call per mode.
The claim under test: COW enrich cost grows with N; MOR enrich cost
tracks P, not N.

Usage: python scripts/mor_enrich_probe.py [--sizes 30000 300000 3000000]
       [--pending 2000] [--trials 2]
Prints a table for SCALING.md; writes nothing outside temp dirs.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seed_staging(spark, store, n: int, pending: int) -> None:
    """n identities, the first `pending` of them in the not-yet-enriched
    state (empty skills, seniority 'not_tried'); the rest fully enriched
    so the enricher must not touch them."""
    from pyspark.sql import functions as F

    is_pending = F.col("id") < pending
    df = spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("hash_key"),
        F.concat(F.lit("job-"), F.col("id")).alias("provider_job_id"),
        F.lit(None).cast("string").alias("job_link"),
        F.concat(F.lit("Senior Engineer "), F.col("id") % 977).alias("job_title"),
        F.concat(F.lit("Co "), F.col("id") % 1009).alias("company"),
        F.lit("unknown").alias("company_size"),
        F.concat(F.lit("City "), F.col("id") % 499).alias("location"),
        F.lit("remote").alias("remote_type"),
        F.lit("full_time").alias("contract_type"),
        F.when(is_pending, F.lit("unknown")).otherwise(F.lit("senior")).alias(
            "seniority_level"
        ),
        F.when(is_pending, F.lit("not_tried"))
        .otherwise(F.lit("upgraded"))
        .alias("seniority_enrichment_status"),
        F.lit(50000.0).alias("salary_min"),
        F.lit(90000.0).alias("salary_max"),
        F.lit("USD").alias("salary_currency"),
        F.concat(F.lit("python and spark, desc "), F.col("id")).alias("description"),
        F.when(is_pending, F.array().cast("array<string>"))
        .otherwise(F.array(F.lit("python")))
        .alias("skills_raw"),
        F.lit(None).cast("timestamp").alias("posted_at"),
        F.lit(None).cast("string").alias("apply_url"),
        F.lit("mock").alias("source"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("first_seen_at"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("last_seen_at"),
    )
    store.write("staging_job_postings", df)


def probe(spark, n: int, pending: int, mor: bool, trials: int) -> float:
    import datetime as dt

    from job_etl_spark.pipeline.runner import TableStore, run_enrich

    best = float("inf")
    for _ in range(trials):
        wh = tempfile.mkdtemp(prefix=f"enrichprobe_{'mor' if mor else 'cow'}_{n}_")
        store = TableStore(spark, wh)
        seed_staging(spark, store, n, pending)
        t0 = time.perf_counter()
        stats = run_enrich(
            store, run_ts=dt.datetime(2026, 1, 2), mor=mor, compact_every=0
        )
        dt_s = time.perf_counter() - t0
        if mor:
            assert stats["enriched_rows"] == pending, stats
        assert stats["seniority_pending_before"] == pending, stats
        best = min(best, dt_s)
        shutil.rmtree(wh, ignore_errors=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[30_000, 300_000, 3_000_000])
    ap.add_argument("--pending", type=int, default=2_000)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from job_etl_spark.session import get_spark

    spark = get_spark("jobspark-enrich-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[tuple[str, int], float] = {}
    print(f"# run_enrich wall-clock, pending={args.pending}, min of {args.trials}")
    print("mode  staging_n  enrich_s")
    for n in args.sizes:
        for mor in (False, True):
            s = probe(spark, n, args.pending, mor, args.trials)
            results[("mor" if mor else "cow", n)] = s
            print(f"{'mor' if mor else 'cow':4s} {n:>9d}  {s:8.2f}", flush=True)
    ns = sorted(args.sizes)
    if len(ns) >= 2:
        lo, hi = ns[0], ns[-1]
        print(
            f"growth {lo}->{hi}: COW x{results[('cow', hi)] / results[('cow', lo)]:.2f} "
            f"| MOR x{results[('mor', hi)] / results[('mor', lo)]:.2f}"
        )


if __name__ == "__main__":
    main()
