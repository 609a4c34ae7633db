"""Custom Python DataSource (S1 scale path): page ranges fan out across
executors and produce exactly the rows the driver-side fetch loop does."""

from __future__ import annotations

import datetime as dt
import json

from job_etl_spark.sources.base import land_raw
from job_etl_spark.sources.datasource import JobsRestDataSource
from job_etl_spark.sources.mock_adapter import MockAdapter


def _read(spark, **opts):
    spark.dataSource.register(JobsRestDataSource)
    r = spark.read.format("jobs_rest").option("adapter", "mock")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_datasource_partitions_and_rows(spark):
    df = _read(
        spark,
        num_jobs=100,
        jobs_per_page=10,
        pages_per_partition=3,
        collected_at="2026-01-01T07:00:00",
    )
    assert df.rdd.getNumPartitions() == 4  # ceil(10 pages / 3)
    assert df.count() == 100
    assert df.select("raw_id").distinct().count() == 100


def test_datasource_matches_driver_fetch_loop(spark):
    """Distributed read == the reference-shaped driver loop (same payloads,
    same source), and replays are identical (deterministic raw_id)."""
    run_ts = dt.datetime(2026, 1, 1, 7, 0, 0)
    df = _read(
        spark, num_jobs=40, jobs_per_page=7, collected_at=run_ts.isoformat()
    )
    loop = land_raw(spark, MockAdapter(num_jobs=40, jobs_per_page=7).fetch_all(), run_ts)

    def keyset(frame):
        return {
            (r["source"], json.loads(r["payload"])["provider_job_id"], r["payload"])
            for r in frame.collect()
        }

    assert keyset(df) == keyset(loop)
    again = _read(
        spark, num_jobs=40, jobs_per_page=7, collected_at=run_ts.isoformat()
    )
    assert sorted(r["raw_id"] for r in again.collect()) == sorted(
        r["raw_id"] for r in df.collect()
    )
