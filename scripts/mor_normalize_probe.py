"""Measure the J3 staging upsert's write amplification: COW vs MOR.

The r7 stream soak measured the generic merge pair (foreach_batch_merge
vs foreach_batch_mor, latest-wins). This probe measures the r9 item
directly: ``run_normalize`` itself — full-outer COALESCE merge + table
rewrite (COW) vs one delta landing + read-time policy fold (MOR) — as
the staging table grows, plus the MOR read cost as deltas accumulate.

Method: seed staging at N rows (synthetic distinct identities in the
real staging schema), land one mock batch in raw, then run K normalize
batches per mode against the SAME seeded table, timing each
``run_normalize`` call wall-clock (min and p50 reported). The claim
under test: COW per-batch cost grows with N; MOR per-batch cost does
not. Then read the MOR table with 0..K deltas outstanding to price the
deferred merge.

Usage: python scripts/mor_normalize_probe.py [--sizes 30000 300000]
       [--batches 5]
Appends nothing; prints a table for SCALING.md.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seed_staging(spark, store, n: int) -> None:
    """n distinct identities in the real staging schema (enriched state,
    so keep-first columns carry non-default values the merge must keep)."""
    from pyspark.sql import functions as F

    df = (
        spark.range(n)
        .select(
            F.md5(F.col("id").cast("string")).alias("hash_key"),
            F.concat(F.lit("job-"), F.col("id")).alias("provider_job_id"),
            F.lit(None).cast("string").alias("job_link"),
            F.concat(F.lit("Engineer "), F.col("id") % 977).alias("job_title"),
            F.concat(F.lit("Co "), F.col("id") % 1009).alias("company"),
            F.lit("unknown").alias("company_size"),
            F.concat(F.lit("City "), F.col("id") % 499).alias("location"),
            F.lit("remote").alias("remote_type"),
            F.lit("full_time").alias("contract_type"),
            F.lit("senior").alias("seniority_level"),
            F.lit("found").alias("seniority_enrichment_status"),
            F.lit(50000.0).alias("salary_min"),
            F.lit(90000.0).alias("salary_max"),
            F.lit("USD").alias("salary_currency"),
            F.concat(F.lit("desc "), F.col("id")).alias("description"),
            F.array(F.lit("python")).alias("skills_raw"),
            F.lit(None).cast("timestamp").alias("posted_at"),
            F.lit(None).cast("string").alias("apply_url"),
            F.lit("mock").alias("source"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("first_seen_at"),
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("last_seen_at"),
        )
    )
    store.write("staging_job_postings", df)


def probe(spark, n: int, batches: int, mor: bool) -> dict:
    import datetime as dt

    from job_etl_spark.pipeline.runner import TableStore, run_extract, run_normalize
    from job_etl_spark.sources.mock_adapter import MockAdapter

    wh = tempfile.mkdtemp(prefix=f"morprobe_{'mor' if mor else 'cow'}_{n}_")
    store = TableStore(spark, wh)
    seed_staging(spark, store, n)
    run_extract(store, MockAdapter(num_jobs=200), run_ts=dt.datetime(2026, 1, 2))
    times = []
    for b in range(batches):
        t0 = time.perf_counter()
        run_normalize(
            store,
            MockAdapter(),
            run_ts=dt.datetime(2026, 1, 2 + b),
            mor=mor,
            compact_every=0,  # measure pure delta writes; compaction priced separately
        )
        times.append(time.perf_counter() - t0)
    out = {
        "mode": "mor" if mor else "cow",
        "n": n,
        "write_min": min(times),
        "write_p50": statistics.median(times),
    }
    if mor:
        reads = []
        for _ in range(3):
            t0 = time.perf_counter()
            store.read("staging_job_postings").count()
            reads.append(time.perf_counter() - t0)
        out["read_min_with_deltas"] = min(reads)
        out["n_deltas"] = len(store.mor_deltas("staging_job_postings"))
        t0 = time.perf_counter()
        store.mor_compact("staging_job_postings")
        out["compact_s"] = time.perf_counter() - t0
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[30_000, 300_000])
    ap.add_argument("--batches", type=int, default=5)
    args = ap.parse_args()

    from job_etl_spark.session import get_spark

    spark = get_spark("jobspark-mor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in args.sizes:
        for mor in (False, True):
            r = probe(spark, n, args.batches, mor)
            rows.append(r)
            print(
                f"{r['mode']:3s} n={n:>7d} write_min={r['write_min']:.3f}s "
                f"p50={r['write_p50']:.3f}s "
                + (
                    f"read(+{r['n_deltas']}d)={r['read_min_with_deltas']:.3f}s "
                    f"compact={r['compact_s']:.3f}s"
                    if mor
                    else ""
                ),
                flush=True,
            )
    cows = {r["n"]: r for r in rows if r["mode"] == "cow"}
    mors = {r["n"]: r for r in rows if r["mode"] == "mor"}
    ns = sorted(cows)
    if len(ns) >= 2:
        lo, hi = ns[0], ns[-1]
        print(
            f"COW write growth {lo}->{hi}: "
            f"{cows[hi]['write_min'] / cows[lo]['write_min']:.2f}x | "
            f"MOR write growth: {mors[hi]['write_min'] / mors[lo]['write_min']:.2f}x"
        )


if __name__ == "__main__":
    main()
