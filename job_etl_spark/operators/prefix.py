"""Scalable global prefix sum (running total over a total order).

A bare ``SUM(x) OVER (ORDER BY k)`` collapses the whole table into ONE
window partition — the classic single-task bottleneck that stalls a
1000-executor cluster on its slowest straggler. The standard distributed
shape (the same trick behind ``zipWithIndex``) is used here, on
DataFrames:

1. split the key range into ``n_buckets`` ORDER-CONTIGUOUS buckets
   (bucket boundaries from a bounded 1-row min/max aggregate);
2. one partial aggregate computes each bucket's total — ``n_buckets``
   rows, collected to the driver (bounded by construction);
3. exclusive bucket offsets are embedded as a literal lookup, and the
   running total is a per-bucket window (parallel across buckets) plus
   the bucket's offset.

Exactly two shuffles (bucket agg + bucket window), each ``n_buckets``-way
parallel; driver traffic is ``n_buckets`` longs. Works for any integral
value column (exact arithmetic — no float reordering concerns).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    order_col: str,
    value_col: Column | str,
    out_col: str = "running_total",
    n_buckets: int = 32,
) -> DataFrame:
    """``df`` + ``out_col`` = inclusive running sum of ``value_col`` in
    ``order_col`` order. ``order_col`` must be integral and unique (a
    surrogate id); ``value_col`` integral."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    bounds = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if bounds is None or bounds["lo"] is None:
        return df.withColumn(out_col, F.lit(None).cast("bigint"))
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = max(1, -(-(hi - lo + 1) // n_buckets))  # ceil
    bucket = ((F.col(order_col) - F.lit(lo)) / F.lit(span)).cast("bigint")
    staged = df.withColumn("_pfx_bucket", bucket).withColumn("_pfx_val", val)
    totals = (
        staged.groupBy("_pfx_bucket")
        .agg(F.sum("_pfx_val").alias("t"))
        .orderBy("_pfx_bucket")
        .collect()  # bounded: ≤ n_buckets rows
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in totals:
        offsets[int(row["_pfx_bucket"])] = acc
        acc += int(row["t"])
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = (
        Window.partitionBy("_pfx_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        staged.withColumn(
            out_col,
            F.sum("_pfx_val").over(w)
            + F.element_at(offset_map, F.col("_pfx_bucket")),
        )
        .drop("_pfx_bucket", "_pfx_val")
    )
