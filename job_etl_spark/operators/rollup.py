"""Hypertable-style continuous aggregates (time-bucketed rollups).

The streaming-database idiom (TimescaleDB continuous aggregates, Druid
rollups): keep a pre-aggregated table keyed by (time_bucket, dims) and
refresh it incrementally as new events land. All aggregate states here
are MERGEABLE (count/sum/min/max — decimal-exact sums), so refreshing is

    rollup(old ∪ delta) == combine(rollup(old), rollup(delta))

one partial aggregation over the delta + one keyed combine — never a
rescan of history. At 100 TB the rollup table is partitioned by bucket
date; a refresh touches only the partitions the delta's buckets land in.
The streaming twin is ``streaming.windowed_event_stats`` +
``foreach_batch_merge`` over the same bucket keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"


HOUR_US = 3_600_000_000


def hourly_rollup(events: DataFrame, ts_col: str = "ts", dims: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Events → one row per (hour bucket, dims) with mergeable states.
    The bucket is pure epoch-microsecond arithmetic — ``date_trunc`` would
    shift boundaries under fractional-offset session timezones."""
    bucket = F.expr(f"(unix_micros({ts_col}) div {HOUR_US}) * {HOUR_US}").alias("bucket_us")
    return (
        events.groupBy(bucket, *[F.col(d) for d in dims])
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).alias("_sum_value"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
        )
    )


def combine_rollups(a: DataFrame, b: DataFrame, dims: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Merge two rollups over the same schema — the incremental refresh.
    Exact because every state is associative (decimal sums, counts,
    min/max)."""
    keys = ["bucket_us", *dims]
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_sum_value").alias("_sum_value"),
            F.min("first_event_id").alias("first_event_id"),
            F.max("last_event_id").alias("last_event_id"),
        )
    )


def finalize_rollup(rollup: DataFrame) -> DataFrame:
    """Render the mergeable states for consumers: exact rounded totals +
    derived average."""
    return rollup.select(
        "bucket_us",
        *[c for c in rollup.columns if c not in ("bucket_us", "n_events", "_sum_value",
                                                 "first_event_id", "last_event_id")],
        "n_events",
        F.round(F.col("_sum_value"), 2).cast("double").alias("total_value"),
        F.round(F.col("_sum_value") / F.col("n_events"), 6).cast("double").alias("avg_value"),
        "first_event_id",
        "last_event_id",
    )
