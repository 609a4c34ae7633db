"""operators/prefix.py and operators/bloom.py — the distributed prefix
sum must equal the single-partition window it replaces, and the bloom
prefilter must be a strict superset of the exact key set (no false
negatives) so the semi-join stays exact."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from job_etl_spark.operators.bloom import bloom_semi_join, build_bloom, might_contain
from job_etl_spark.operators.prefix import running_total
from job_etl_spark.tables import table
from tests.conftest import SF_SMOKE


def test_running_total_matches_naive_window(spark):
    li = table(spark, SF_SMOKE, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k"),
        F.col("l_quantity").cast("bigint").alias("v"),
    )
    got = {
        r["k"]: r["running_total"]
        for r in running_total(li, "k", "v").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["k"]: r["rt"]
        for r in li.withColumn("rt", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_running_total_no_single_partition_window(spark):
    """The whole point: the plan's window partitions on the bucket column,
    never on an empty (global) partition spec."""
    li = table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.lit(1).alias("v")
    )
    df = running_total(li.dropDuplicates(["k"]), "k", "v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "_pfx_bucket" in plan  # window is keyed on the bucket


def test_running_total_empty_input(spark):
    li = table(spark, SF_SMOKE, "lineitem").where("l_quantity < 0").select(
        F.col("l_orderkey").alias("k"), F.lit(1).alias("v")
    )
    assert running_total(li, "k", "v").count() == 0


def test_bloom_no_false_negatives(spark):
    orders = table(spark, SF_SMOKE, "orders")
    build = orders.where("o_orderpriority = '1-URGENT'").select("o_orderkey")
    bitmap = build_bloom(build, "o_orderkey")
    missed = build.where(
        ~might_contain(bitmap, F.col("o_orderkey"))
    ).count()
    assert missed == 0


def test_bloom_semi_join_exact(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    orders = table(spark, SF_SMOKE, "orders")
    build = orders.where("o_orderpriority = '1-URGENT'").select("o_orderkey")
    got = bloom_semi_join(li, build, "l_orderkey", "o_orderkey")
    want = li.join(
        build.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        "l_orderkey",
        "left_semi",
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_bloom_filter_actually_prunes(spark):
    """Selectivity check: the prefilter should reject most non-matching
    keys (false-positive rate ≪ 1 at this fill factor)."""
    orders = table(spark, SF_SMOKE, "orders")
    build = orders.where("o_orderpriority = '1-URGENT'").select("o_orderkey")
    bitmap = build_bloom(build, "o_orderkey")
    li = table(spark, SF_SMOKE, "lineitem")
    total = li.count()
    passed = li.where(might_contain(bitmap, F.col("l_orderkey"))).count()
    truly = li.join(
        build.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        "l_orderkey",
        "left_semi",
    ).count()
    # everything true passes; false positives stay under 5% of the rest
    assert passed >= truly
    assert (passed - truly) <= 0.05 * max(1, total - truly)
