"""Bucketed tables — shuffle-free keyed joins and merges (SURVEY §4.2.5).

The engine's hot keys (staging.hash_key, companies.company_id) join and
merge on every run. Bucketing both sides on the key with equal bucket
counts makes those sort-merge joins exchange-free: each task reads its
bucket from both tables, no shuffle, no AQE needed. At 100 TB this turns
the daily merge from a full-table shuffle into a bucket-local merge.

Parquet bucketing requires the session catalog (``saveAsTable``); the
spec is Hive-compatible, so a real deployment reads the same layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    keys: Sequence[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  keys: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys; with
    matching bucket specs Spark plans a zero-Exchange sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), list(keys), how)
