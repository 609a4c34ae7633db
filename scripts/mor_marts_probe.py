"""Measure the marts stage's write amplification: COW full rebuild vs
O(new rows) MOR increment (r10 verdict #1, landed r11).

The dbt models declare INCREMENTAL semantics (fact_jobs.sql:23-31 — rows
past ``MAX(ingested_at)``; dim_companies.sql:38-44 — rows past the
created_at watermark), but the engine's COW path materializes the full
rebuild and rewrites both marts every run. ``run_marts(mor=True)``
restores the declared shape: the increment past each watermark lands as
ONE merge-on-read delta (fact under ``fact_merge_policy`` — the fold's
COALESCE on the rank pair is the J2 carry; dim latest-wins), and a
zero-new run touches no base file.

Method: seed fact at N ranked rows + staging at N rows, pre-migrate the
MOR arm (untimed), then append a FIXED number of NEW staging rows past
the watermark and time ONE ``run_marts`` per mode. The claim under test:
COW marts cost grows with N; MOR marts cost tracks the new-row count,
not N.

Usage: python scripts/mor_marts_probe.py [--sizes 30000 300000 3000000]
       [--new 2000] [--trials 2]
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

TS_OLD = "2026-01-01 00:00:00"
TS_FACT = "2026-01-02 00:00:00"
TS_NEW = "2026-01-05 00:00:00"


def staging_frame(spark, ids, first_seen: str, company_tag: str, companies_mod: int):
    from pyspark.sql import functions as F

    return ids.select(
        F.md5(F.concat(F.lit(company_tag), F.col("id").cast("string"))).alias(
            "hash_key"
        ),
        F.concat(F.lit("job-"), F.lit(company_tag), F.col("id")).alias(
            "provider_job_id"
        ),
        F.lit(None).cast("string").alias("job_link"),
        F.concat(F.lit("Senior Engineer "), F.col("id") % 977).alias("job_title"),
        F.concat(F.lit(company_tag), F.col("id") % companies_mod).alias("company"),
        F.lit("unknown").alias("company_size"),
        F.concat(F.lit("City "), F.col("id") % 499).alias("location"),
        F.lit("remote").alias("remote_type"),
        F.lit("full_time").alias("contract_type"),
        F.lit("senior").alias("seniority_level"),
        F.lit("upgraded").alias("seniority_enrichment_status"),
        F.lit(50000.0).alias("salary_min"),
        F.lit(90000.0).alias("salary_max"),
        F.lit("USD").alias("salary_currency"),
        F.concat(F.lit("python and spark, desc "), F.col("id")).alias("description"),
        F.array(F.lit("python")).alias("skills_raw"),
        F.lit(None).cast("timestamp").alias("posted_at"),
        F.lit(None).cast("string").alias("apply_url"),
        F.lit("mock").alias("source"),
        F.to_timestamp(F.lit(first_seen)).alias("first_seen_at"),
        F.to_timestamp(F.lit(first_seen)).alias("last_seen_at"),
    )


def companies_frame(spark, n: int, tag: str, created: str):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.md5(F.concat(F.lit(tag), F.col("id").cast("string"))).alias("company_id"),
        F.concat(F.lit(tag), F.col("id")).alias("name"),
        F.lit("mock").alias("source_first_seen"),
        F.lit(None).cast("timestamp").alias("enriched_at"),
        F.to_timestamp(F.lit(created)).alias("created_at"),
        F.to_timestamp(F.lit(created)).alias("updated_at"),
    )


def seed(spark, store, n: int) -> None:
    """Staging + companies at N scale, fact pre-built AND pre-ranked from
    them (ingested_at = TS_FACT is the watermark the new rows must pass)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from job_etl_spark.pipeline.marts import fact_projection

    old = staging_frame(spark, spark.range(n), TS_OLD, "Co ", 1009)
    store.write("staging_job_postings", old)
    store.write("staging_companies", companies_frame(spark, min(n, 1009), "Co ", TS_OLD))
    fact = (
        fact_projection(
            store.read("staging_job_postings"), dt.datetime(2026, 1, 2)
        )
        .withColumn("rank_score", F.lit(42.0))
        .withColumn("rank_explain", F.create_map(F.lit("seed"), F.lit(42.0)))
    )
    store.write("fact_jobs", fact)


def probe(spark, n: int, new: int, mor: bool, trials: int) -> float:
    import datetime as dt

    from job_etl_spark.pipeline.runner import TableStore, run_marts

    new_companies = max(new // 10, 1)
    best = float("inf")
    for _ in range(trials):
        wh = tempfile.mkdtemp(prefix=f"martsprobe_{'mor' if mor else 'cow'}_{n}_")
        store = TableStore(spark, wh)
        seed(spark, store, n)
        if mor:
            # migration (base materialization) is a one-time setup cost,
            # not the steady-state write — untimed, zero-new by watermark
            pre = run_marts(store, run_ts=dt.datetime(2026, 1, 3), mor=True)
            assert pre["fact_new"] is None or pre["fact_new"] == 0, pre
        # the increment: NEW staging identities + NEW companies past both
        # watermarks (first_seen_at/created_at > the seeded marks)
        store.write(
            "staging_job_postings",
            staging_frame(spark, spark.range(new), TS_NEW, "NewCo ", new_companies),
            mode="append",
        )
        store.write(
            "staging_companies",
            companies_frame(spark, new_companies, "NewCo ", TS_NEW),
            mode="append",
        )
        t0 = time.perf_counter()
        stats = run_marts(store, run_ts=dt.datetime(2026, 1, 6), mor=mor)
        dt_s = time.perf_counter() - t0
        assert stats["fact_rows"] == n + new, stats
        if mor:
            assert stats["fact_new"] == new, stats
            assert stats["dim_new"] == new_companies, stats
        best = min(best, dt_s)
        shutil.rmtree(wh, ignore_errors=True)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[30_000, 300_000, 3_000_000])
    ap.add_argument("--new", type=int, default=2_000)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from job_etl_spark.session import get_spark

    spark = get_spark("jobspark-marts-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[tuple[str, int], float] = {}
    print(f"# run_marts wall-clock, new={args.new}, min of {args.trials}")
    print("mode  fact_n  marts_s")
    for n in args.sizes:
        for mor in (False, True):
            s = probe(spark, n, args.new, mor, args.trials)
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
