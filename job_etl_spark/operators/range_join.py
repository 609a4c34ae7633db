"""Banded interval/range join — an operator Spark lacks natively.

Join left rows to right rows with ``right_val ∈ [left_val + lower,
left_val + upper]`` (plus optional equi keys). The naive plan is either a
key-only equi join with a post-filter (per-key cartesian — quadratic on
hot keys) or, with no keys, a broadcast-nested-loop join (never viable at
100 TB).

This implementation uses the standard bucketed interval strategy (the
Flink interval-join / Spark range-join-hint physical plan, built from
first principles on the DataFrame API):

    band  = a bucket width ≥ the interval span (upper - lower)
    left  → explode to the ≤2 covering buckets of [lv+lower, lv+upper]
    right → single bucket floor(rv / band)
    equi join on (keys…, bucket)  → exact range post-filter

Cost: one shuffle on (keys…, bucket), each left row duplicated at most
``ceil(span/band)+1`` times (2 when band == span), each right row exactly
once, and no matched pair is produced twice because a right row lives in
exactly one bucket. Bucket keys also spread key-skew: a hot equi key is
subdivided by time, so AQE sees smaller partitions than a key-only join.

Reference parity note: the reference has no range join (SURVEY.md §2.3 —
"No cartesian, theta, range/as-of … joins"); this is a scale-path
extension, oracle-checked against DuckDB's native BETWEEN join in q44.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_val: str,
    right_val: str,
    lower: int,
    upper: int,
    band: int | None = None,
) -> DataFrame:
    """Inner-join rows where ``right.right_val`` falls in
    ``[left.left_val + lower, left.left_val + upper]`` (bounds inclusive)
    and all ``keys`` match. ``left_val``/``right_val`` must be integral
    (e.g. epoch micros). ``band`` defaults to the interval span.

    Output columns: all left columns, then the right columns not already
    taken by the left (right-side duplicates of ``keys`` are dropped).
    """
    if upper < lower:
        raise ValueError(f"empty interval: lower={lower} > upper={upper}")
    span = upper - lower
    band = band or max(span, 1)

    lo = F.col(left_val) + F.lit(lower)
    hi = F.col(left_val) + F.lit(upper)
    # every bucket index in [floor(lo/band), floor(hi/band)] — with
    # band ≥ span this sequence has length ≤ 2
    l_exploded = left.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(lo / band), F.floor(hi / band))),
    )
    r_bucketed = right.withColumn("_bucket", F.floor(F.col(right_val) / band))

    collisions = (set(left.columns) & set(right.columns)) - set(keys)
    if collisions:
        raise ValueError(
            f"rename right-side columns {sorted(collisions)} before joining — "
            "non-key name collisions would be dropped silently"
        )
    taken = set(left.columns) | {"_bucket"}
    r_cols = [c for c in right.columns if c not in taken]
    cond = [l_exploded[k] == r_bucketed[k] for k in keys] + [
        l_exploded["_bucket"] == r_bucketed["_bucket"],
        r_bucketed[right_val] >= l_exploded[left_val] + F.lit(lower),
        r_bucketed[right_val] <= l_exploded[left_val] + F.lit(upper),
    ]
    return l_exploded.join(r_bucketed, cond, "inner").select(
        *[l_exploded[c] for c in left.columns],
        *[r_bucketed[c] for c in r_cols],
    )
