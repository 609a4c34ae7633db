"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, find the right row with the greatest timestamp ≤ the
left timestamp within the same key. The naive formulation is a range
join (quadratic blow-up per key); this implementation is the scalable
union-tag composition:

    tag right rows 0, left rows 1
    → one sort per key on (ts, tag, ...)     [single shuffle on the key]
    → carry the last-seen right ROW forward (last ignorenulls window
      over a single struct, so every value column comes from the SAME
      matched row — per-column carries would stitch together values from
      different right rows whenever a matched row holds NULLs)
    → keep the left rows

Cost: one shuffle + one window pass — linear in input size, skew-safe
with AQE, no per-key cartesian. DuckDB's native ASOF JOIN is the oracle
twin in q37.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    row qualifies; ``how="inner"`` keeps only left rows with a matched
    right row (even when the matched row's values are all NULL).

    Forward is implemented by running the backward plan on a negated
    integral time axis (same single shuffle + window pass)."""
    clash = set(value_cols) & {c for c in left.columns if c != key and c != left_ts}
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} already exist on the left side; "
            "rename them on one side first"
        )
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
    right_types = dict(right.dtypes)
    row_struct = F.struct(*[F.col(c) for c in value_cols])
    null_struct = F.lit(None).cast(
        "struct<" + ", ".join(f"{c}: {right_types[c]}" for c in value_cols) + ">"
    )
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in left.columns if c != key and c != left_ts],
        null_struct.alias("_r_row"),
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
        row_struct.alias("_r_row"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal _ts so ties match (<=)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_r_row", ignorenulls=True).over(w).alias("_asof_row")
    )
    out = carried.where(F.col("_tag") == 1).drop("_tag", "_r_row")
    if how == "inner":
        out = out.where(F.col("_asof_row").isNotNull())
    for c in value_cols:
        out = out.withColumn(c, F.col("_asof_row").getField(c))
    out = out.drop("_asof_row").withColumnRenamed("_ts", left_ts)
    return out
