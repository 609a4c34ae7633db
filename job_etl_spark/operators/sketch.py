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


# ---------------------------------------------------------------------------
# K-minimum-values distinct sketch — the deterministic sibling of
# HyperLogLog. approx_count_distinct's HLL± state is engine-private and
# not comparable across systems; KMV (Bar-Yossef et al., RANDOM 2002)
# keeps the k smallest md5-derived 60-bit hashes of the key domain, so
# - the sketch IS a set of integers → union-merge = merge the sets and
#   re-take the k smallest (associative, commutative);
# - distinct estimate = (k−1) · 2^60 / kth_min (uniform order statistics);
# - any engine reproduces the identical sketch AND estimate bit-for-bit.
# Long format: one row per (group..., h) kept hash — same contract as
# histogram_sketch above.
# ---------------------------------------------------------------------------

KMV_SPACE = float(1 << 60)  # hexint() hash space: 15 hex chars


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    k: int = 64,
    salt_buckets: int = 64,
) -> DataFrame:
    """k smallest distinct key hashes per group. Dedup first (distinct on
    (group, hash) — a partial-agg shuffle), then top-k in TWO phases:
    per-(group, salt) candidates, then the final k over ≤ salt_buckets·k
    rows per group. A single per-group window would sort the group's whole
    distinct domain in one partition — the skew that kills a billion-key
    group; the salted phase bounds every sort input. The k smallest of
    the per-salt k-smallest ARE the global k smallest, so the result is
    identical."""
    from job_etl_spark.ml.dedup import hexint

    hashed = (
        df.select(*group_cols, hexint(F.col(key_col).cast("string")).alias("h"))
        # a NULL key hashes to NULL; Spark's ASC NULLS FIRST would hand it
        # rank 1 (stealing a slot and inflating n_kept) while SQL engines
        # sort it last — NULL keys are simply not domain elements
        .where(F.col("h").isNotNull())
        .distinct()
    )
    w1 = Window.partitionBy(*group_cols, F.col("h") % salt_buckets).orderBy("h")
    cand = (
        hashed.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        cand.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def merge_kmv(group_cols: Sequence[str], k: int, *sketches: DataFrame) -> DataFrame:
    """Union the kept-hash sets, re-take the k smallest — yields exactly
    the sketch of the unioned inputs. Same salted two-phase top-k as the
    build: even when a group key constant-folds (the '__all__' merge), no
    window ever runs partition-less over the whole union."""
    it = iter(sketches)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    w1 = Window.partitionBy(*group_cols, F.col("h") % 64).orderBy("h")
    cand = (
        u.distinct()
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
    )
    # final k over ≤ 64·k candidates per group: a bounded array fold, so
    # a constant-folded group key never yields a partition-less window
    return cand.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("_hs")
    ).select(*group_cols, F.explode("_hs").alias("h"))


def kmv_estimate(sketch: DataFrame, group_cols: Sequence[str], k: int) -> DataFrame:
    """(group..., n_kept, kth_min, est_distinct). A group holding fewer
    than k hashes saw its whole domain → the estimate is exact."""
    g = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth_min")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("kth_min").cast("double"))
    return g.select(*group_cols, "n_kept", "kth_min", est.alias("est_distinct"))
