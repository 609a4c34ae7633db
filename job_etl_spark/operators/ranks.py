"""Distributed global ranking — exact row_number / ntile without the
single-task unpartitioned window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the entire input
through ONE task — correct, but a serialization point that dies at corpus
scale. The standard distributed formulation used here:

1. ``repartitionByRange`` on the order columns (range partitioner ⇒
   partition *i* holds strictly smaller keys than partition *i+1*);
2. per-partition row counts — a bounded driver collect (one row per
   partition, NOT per data row);
3. partition-local ``row_number`` windows (parallel) + the broadcast
   cumulative offsets ⇒ the exact global rank.

``ntile`` then derives from the global rank with the SQL-standard
equal-count definition (remainder rows go to the leading tiles), which is
identical in Spark and DuckDB — so queries keep their plain
``ntile() OVER (ORDER BY ...)`` oracle twins.

The order columns must form a TOTAL order (include a unique tie-break);
ties that span a range boundary would otherwise make ranks
partition-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "_gr_pid"
_LRN = "_gr_lrn"


def global_row_number(
    df: DataFrame, order_cols: list, out_col: str = "rank", num_partitions: int | None = None
) -> DataFrame:
    """Exact 1-based global row_number over a total order, computed with
    partition-parallel windows. Adds ``out_col``; preserves all input
    columns. Triggers one bounded job (per-partition counts)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    # Materialize the range-partitioned frame ONCE: RangePartitioner samples
    # with a seed derived from the RDD id (different per job) and AQE may
    # coalesce the un-numbered range shuffle differently per job — without
    # this the counts job and the window job can see DIFFERENT partition
    # boundaries/ids, mismatching the broadcast offsets map (wrong or NULL
    # global ranks).
    with_pid = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    # bounded collect: one row PER PARTITION
    counts = {
        r[_PID]: r["n"]
        for r in with_pid.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(
            *[x for pid in offsets for x in (F.lit(pid), F.lit(offsets[pid]))]
        ),
        F.col(_PID),
    ) if offsets else F.lit(0)
    w = Window.partitionBy(_PID).orderBy(*cols)
    return (
        with_pid.withColumn(_LRN, F.row_number().over(w))
        .withColumn(out_col, (F.col(_LRN) + off_expr).cast("bigint"))
        .drop(_PID, _LRN)
    )


def ntile_from_rank(rank, total: int, n: int):
    """SQL-standard ntile from a 1-based global rank: the first
    ``total % n`` tiles get ``total // n + 1`` rows, the rest get
    ``total // n`` (Spark's and DuckDB's shared definition)."""
    small = total // n
    rem = total % n
    big = small + 1
    boundary = rem * big  # ranks 1..boundary fall in the big tiles
    if small == 0:
        return rank.cast("int")  # fewer rows than tiles: tile == rank
    return (
        F.when(
            rank <= F.lit(boundary),
            F.floor((rank - 1) / F.lit(big)) + 1,
        ).otherwise(
            F.floor((rank - 1 - F.lit(boundary)) / F.lit(small)) + F.lit(rem) + 1
        )
    ).cast("int")


def global_ntile(
    df: DataFrame, order_cols: list, n: int, out_col: str = "tile"
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` without a single-task
    window. Two bounded jobs (partition counts ride along); the total row
    count is the sum of the already-collected per-partition counts, so no
    extra pass over the data."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = df.repartitionByRange(*cols)
    # same single-materialization as global_row_number: both jobs must read
    # the same physical partitioning (per-job range-sampling seed + AQE)
    with_pid = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    counts = {
        r[_PID]: r["n"]
        for r in with_pid.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(
            *[x for pid in offsets for x in (F.lit(pid), F.lit(offsets[pid]))]
        ),
        F.col(_PID),
    ) if offsets else F.lit(0)
    w = Window.partitionBy(_PID).orderBy(*cols)
    rank = (F.row_number().over(w) + off_expr).cast("bigint")
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    return (
        with_pid.withColumn(out_col, ntile_from_rank(rank, total, n))
        .drop(_PID)
    )
