"""Mergeable fixed-bin histogram quantile sketch.

``approx_percentile`` has a mergeable internal state (KLL/GK) but does not
expose it for incremental pipelines. This operator makes the mergeability
explicit with the simplest sketch that has it: an equi-width histogram over
a known value range, kept in LONG format ``(group..., bin, cnt)``.

- build   = one partial+final hash agg over the fact table (map-side
  combine shrinks each partition to ≤ nbins rows before the shuffle);
- merge   = union + re-aggregate — associative and commutative, so
  tonight's sketch plus today's increment equals a full recompute
  (the continuous-aggregate property, same contract as operators/rollup.py);
- read-off = window cumsum over ≤ nbins rows per group.

Estimates are deterministic (bin upper edge at the target rank), so unlike
``approx_percentile`` the sketch quantile is bit-reproducible across engines
and partitionings — the error bound is (hi-lo)/nbins instead of a rank ε.
Reference parity: SURVEY §2.4 A12 scale path (exact percentiles stay q43).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Long-format sketch: one row per (group, non-empty bin).

    Out-of-range values clamp into the edge bins, so merging sketches
    built with the same (lo, hi, nbins) is always sound. NULL values are
    excluded (greatest() would otherwise clamp them into bin 0 and skew
    every quantile low — approx_percentile, the thing this replaces,
    ignores NULLs too).
    """
    width = (hi - lo) / nbins
    bin_ = (
        F.least(
            F.lit(nbins - 1),
            F.greatest(F.lit(0).cast("long"), F.floor((F.col(value_col) - lo) / width)),
        )
    ).cast("int")
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_sketches(group_cols: Sequence[str], *sketches: DataFrame) -> DataFrame:
    """Associative merge: union + re-sum. Narrow (≤ nbins rows per group
    per input), so incremental refresh shuffles sketch rows, not facts."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def sketch_quantiles(
    sketch: DataFrame,
    group_cols: Sequence[str],
    quantiles: dict[str, float],
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """One row per group with a column per requested quantile.

    Estimate = upper edge of the first bin whose cumulative count reaches
    ``ceil(q * total)`` — rank semantics of percentile_disc, quantized to
    the bin grid. All arithmetic is IEEE double + integer compare, so the
    same read-off in another engine is bit-identical.
    """
    width = (hi - lo) / nbins
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    cum = F.sum("cnt").over(wcum)
    tot = F.sum("cnt").over(wtot)
    staged = sketch.select(
        *group_cols,
        F.col("bin"),
        cum.alias("_cum"),
        tot.alias("_tot"),
    )
    edge: Column = F.lit(lo) + (F.col("bin") + 1) * F.lit(width)
    aggs = [
        F.min(
            F.when(
                F.col("_cum") >= F.ceil(F.col("_tot") * F.lit(q)).cast("bigint"), edge
            )
        ).alias(name)
        for name, q in quantiles.items()
    ]
    return staged.groupBy(*group_cols).agg(*aggs)


def sql_sketch_quantiles(
    table_expr: str,
    value_col: str,
    group_cols: Sequence[str],
    quantiles: dict[str, float],
    lo: float,
    hi: float,
    nbins: int,
) -> str:
    """DuckDB twin of build→read-off (merge is associative, so the
    single-pass SQL equals any merge tree over the same rows)."""
    width = (hi - lo) / nbins
    gcols = ", ".join(group_cols)
    qcols = ",\n       ".join(
        f"MIN(CASE WHEN _cum >= CAST(CEIL(_tot * {q}::DOUBLE) AS BIGINT) "
        f"THEN {lo}::DOUBLE + (bin + 1) * {width!r}::DOUBLE END) AS {name}"
        for name, q in quantiles.items()
    )
    return f"""
WITH sk AS (
  SELECT {gcols},
         CAST(LEAST({nbins - 1}, GREATEST(0, FLOOR(({value_col} - {lo}::DOUBLE) / {width!r}::DOUBLE))) AS INT) AS bin,
         COUNT(*) AS cnt
  FROM {table_expr}
  GROUP BY ALL
), staged AS (
  SELECT {gcols}, bin,
         SUM(cnt) OVER (PARTITION BY {gcols} ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS _cum,
         SUM(cnt) OVER (PARTITION BY {gcols}) AS _tot
  FROM sk
)
SELECT {gcols},
       {qcols}
FROM staged
GROUP BY {gcols}
"""
