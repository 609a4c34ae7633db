"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, find the right row with the greatest timestamp ≤ the
left timestamp within the same key. The naive formulation is a range
join (quadratic blow-up per key); this implementation is the scalable
union-tag composition:

    tag right rows 0, left rows 1
    → one sort per key on (ts, tag, ...)     [single shuffle on the key]
    → carry the last-seen right value forward (last ignorenulls window)
    → keep the left rows

Cost: one shuffle + one window pass — linear in input size, skew-safe
with AQE, no per-key cartesian. DuckDB's native ASOF JOIN is the oracle
twin in q37.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + the value columns of the
    *nearest* right row for the same ``key`` — with ``direction``
    ``"backward"`` (default) the latest right row with
    ``right_ts <= left_ts``; with ``"forward"`` the earliest right row
    with ``right_ts >= left_ts``. Ties at equal timestamps match in both
    directions. ``value_cols`` carry from the right side, NULL when no
    row qualifies.

    Forward is implemented by running the backward plan on a negated
    integral time axis (same single shuffle + window pass)."""
    if direction == "forward":
        nl = left.withColumn(left_ts, -F.col(left_ts))
        nr = right.withColumn(right_ts, -F.col(right_ts))
        out = asof_join(nl, nr, key, left_ts, right_ts, value_cols, how, "backward")
        out = out.withColumn(left_ts, -F.col(left_ts))
        if right_ts in value_cols:  # the carried copy was negated too
            out = out.withColumn(right_ts, -F.col(right_ts))
        return out
    if direction != "backward":
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in left.columns if c != key and c != left_ts],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c != key and c != left_ts
        ],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal _ts so ties match (<=)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("_tag") == 1).drop(
        "_tag", *[f"_r_{c}" for c in value_cols]
    )
    for c in value_cols:
        out = out.withColumnRenamed(f"_asof_{c}", c)
    out = out.withColumnRenamed("_ts", left_ts)
    if how == "inner":
        out = out.where(F.col(value_cols[0]).isNotNull())
    return out
