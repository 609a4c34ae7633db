"""Top-k (reference parity: O1/O2/O4).

``orderBy(...).limit(k)`` — Spark plans this as TakeOrderedAndProject:
each partition keeps its local top-k, the driver merges k·p rows. No full
sort, no full shuffle; survives 100 TB as long as k is bounded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)
