"""A/B probe: single-task scan vs parallelized scan for aggregate-heavy
relational queries over the single-row-group sf tables.

Variants per query:
  base  — as declared (table(): one scan task does scan + partial agg)
  rr    — round-robin repartition(defaultParallelism) before the agg
          (pays sortBeforeRepartition's local sort in the map task)
  hash  — repartition(defaultParallelism, high-card key) (no local sort)

Interleaved min-of-N in ONE session so box weather hits all variants
equally. Results are order-insensitive (decimal sums / counts), so the
row-order nondeterminism of a repartition cannot change any value.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from job_etl_spark.session import get_spark  # noqa: E402
from job_etl_spark.tables import table  # noqa: E402
from job_etl_spark.queries.relational import dsum, davg  # noqa: E402

SF = "/root/testdata/sf0.1"
N = 5


def q01_variant(spark, li):
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("high_disc_count"),
        )
    )


def main() -> None:
    spark = get_spark("parallel-scan-probe")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    li = table(spark, SF, "lineitem")

    variants = {
        "base": lambda: q01_variant(spark, li),
        "rr": lambda: q01_variant(spark, li.repartition(par)),
        "hash": lambda: q01_variant(spark, li.repartition(par, "l_orderkey")),
    }
    # warmup
    q01_variant(spark, li).write.format("noop").mode("overwrite").save()
    times = {k: [] for k in variants}
    for _ in range(N):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"q01/{k}: min={min(ts):.3f} runs={[round(t,3) for t in ts]}")
    # sanity: identical results across variants
    rows = {
        k: sorted(map(tuple, fn().collect())) for k, fn in variants.items()
    }
    print("identical:", rows["base"] == rows["rr"] == rows["hash"])


if __name__ == "__main__":
    main()
