"""Count-min sketch — a mergeable frequency sketch for heavy hitters.

At 100 TB you cannot keep an exact per-token count table hot, but a
D×W counter matrix (a few KiB) answers "how often did key k appear?"
with a one-sided error: estimate ≥ truth, overshoot ≤ εN with
probability 1−δ for W = ⌈e/ε⌉, D = ⌈ln 1/δ⌉ (Cormode & Muthukrishnan,
J. Algorithms 2005). The engine keeps the sketch in LONG format
``(depth, cell, n)`` — the same representation contract as
``operators/sketch.py``'s histogram:

- build   = one partial+final hash agg (map-side combine reduces every
  partition to ≤ D·W rows before the shuffle);
- merge   = union + re-sum — associative/commutative, so per-shard or
  per-day sketches combine into exactly the full-corpus sketch;
- probe   = explode a candidate's D cells, join on (depth, cell), take
  MIN over depth. The sketch side is ≤ D·W rows → always broadcast.

Hashes are md5-derived (``ml/dedup.hexint``), so any engine — including
the DuckDB oracle — reproduces the identical matrix, estimates included.
Reference: the reference engine has no frequency sketch; this is the
scale path behind its exact GROUP BY counts (SURVEY §2.4 A2/A6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from job_etl_spark.ml.dedup import hexint


def cms_cells(key: Column, depth: int, width: int) -> Column:
    """array<struct<depth, cell>> — the D hash cells of one key. Row i uses
    md5("i|" + key): independent-enough hash rows, engine-reproducible."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                (hexint(F.concat(F.lit(f"{i}|"), key)) % width)
                .cast("int")
                .alias("cell"),
            )
            for i in range(depth)
        ]
    )


def build_cms(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(depth, cell, n) — one row per touched counter. Each input row
    increments D counters: explode the cell array, then one hash agg."""
    return (
        df.select(F.explode(cms_cells(F.col(key_col), depth, width)).alias("h"))
        .groupBy(F.col("h.depth").alias("depth"), F.col("h.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """Union + re-sum: merging shard sketches ≡ building over the union."""
    it = iter(sketches)
    u = next(it)
    for s in it:
        u = u.unionByName(s)
    return u.groupBy("depth", "cell").agg(F.sum("n").alias("n"))


def probe_cms(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query every row of ``keys``: adds an ``est`` column =
    min over the D probed counters (0 if a counter row is absent —
    an untouched counter means the key was never seen). Row-preserving:
    the fan-out/fan-in is keyed on a per-row id, so duplicate key rows
    come back one-for-one and unorderable columns (maps) pass through."""
    with_id = keys.withColumn("_rid", F.monotonically_increasing_id())
    probed = with_id.select(
        "_rid", key_col, F.explode(cms_cells(F.col(key_col), depth, width)).alias("h")
    ).select("_rid", F.col("h.depth").alias("depth"), F.col("h.cell").alias("cell"))
    est = (
        probed.join(F.broadcast(sketch), ["depth", "cell"], "left")
        .groupBy("_rid")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )
    return with_id.join(est, "_rid").drop("_rid")
