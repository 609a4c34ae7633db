"""DISTINCT ON — keep one row per key (reference parity: A4).

The reference's ``SELECT DISTINCT ON (company_id) … ORDER BY company_id,
first_seen_at ASC`` (``services/enricher/db_operations.py:295-306``) is the
canonical Spark window dedup: ``row_number() OVER (PARTITION BY key ORDER
BY ...) = 1``. One shuffle on the key; at 100 TB, partition-local if the
table is bucketed on the key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distinct_on(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """Keep the first row per ``keys`` under ``order_by``. Tie-break the
    ordering with a unique column for deterministic results."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
