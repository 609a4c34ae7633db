"""High-watermark incremental predicates (reference parity: A5/P4).

The reference drives incrementality with scalar watermarks —
``COALESCE(MAX(ingested_at),'1900-01-01')`` in dbt
(``dbt/job_dbt/models/marts/fact_jobs.sql:46-52``) and task-start-minus-
margin timestamps in the DAG (``airflow/dags/jobs_etl_daily.py:729-807``).

In Spark the scalar aggregate is one job over the (column-pruned,
statistics-backed) table; the resulting literal folds into the incremental
scan's pushed-down filter, so the big table is read once with partition
pruning when partitioned by the watermark column's date.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPOCH_FLOOR = _dt.datetime(1900, 1, 1)


def high_watermark(df: DataFrame, col: str, floor: _dt.datetime = EPOCH_FLOOR):
    """MAX(col) with the reference's 1900-01-01 floor; returns a Python scalar."""
    row = df.agg(F.max(F.col(col)).alias("wm")).first()
    wm = row["wm"]
    return wm if wm is not None else floor


def incremental_filter(df: DataFrame, col: str, watermark, strict: bool = True) -> DataFrame:
    """Filter rows newer than the watermark (``>`` per the reference's
    ``first_seen_at > MAX(ingested_at)``; ``>=`` for the margin-based scans)."""
    c = F.col(col)
    return df.where(c > F.lit(watermark)) if strict else df.where(c >= F.lit(watermark))
