"""Loaders for the driver-provided synthetic tables (TESTDATA.md).

One parquet file per table at /root/testdata/sf{0.001,0.01,0.1}/.
All reads go through ``table()`` so filters/projections applied by callers
are pushed down into the parquet scan by Catalyst (verified via
``.explain`` — PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
        # parquet reader rejects; read nanos as long and truncate to micros
        # (matching every engine that reads ns at microsecond precision).
        # The raw long survives as _ts_ns: filters on the DERIVED ts can't
        # reach the parquet scan, but filters on _ts_ns push down — use
        # ts_ns_predicate() for incremental scans.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("_ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_ns_strictly_after(cutoff) -> "F.Column":
    """Pushdown-friendly strict ``ts > cutoff`` for the events table:
    ``ts_µs > X  ⇔  _ts_ns ≥ (X+1)·1000`` — exact equivalence under the
    ns→µs truncation, expressed on the RAW parquet column so the
    predicate reaches the scan (PushedFilters + row-group skipping)."""
    import datetime as _dt

    if isinstance(cutoff, _dt.datetime):
        import calendar

        # integer µs arithmetic — float .timestamp() loses sub-µs precision
        micros = calendar.timegm(cutoff.utctimetuple()) * 1_000_000 + cutoff.microsecond
    else:
        micros = int(cutoff)
    return F.col("_ts_ns") >= (micros + 1) * 1000


def parallel_scan(df: DataFrame) -> DataFrame:
    """Give a compute-heavy map stage full cluster parallelism even when
    the scan collapses to a handful of splits (a single-file,
    single-row-group table — parquet can't be byte-range-split below the
    row group, so a small file pins the whole stage to one core).

    No-op when the scan already has ≥ defaultParallelism partitions —
    always true for a real at-scale table — so the round-robin shuffle
    only ever happens on inputs small enough that it costs microseconds
    against the per-row hashing it unlocks (measured 1.7-4.5× on the
    near-dup suite at sf0.1)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so Spark SQL can reference them."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
