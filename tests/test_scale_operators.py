"""Scale-path operators: bucketed zero-shuffle joins, salted skew
mitigation — plan-level and correctness assertions."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_etl_spark.operators.bucketing import bucketed_join, write_bucketed
from job_etl_spark.operators.skew import salted_agg_count, salted_join
from job_etl_spark.tables import table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    orders = table(spark, SF_SMOKE, "orders")
    cust = table(spark, SF_SMOKE, "customer").withColumnRenamed("c_custkey", "o_custkey")
    write_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    write_bucketed(cust, "b_customer", ["o_custkey"], num_buckets=8)
    # disable auto-broadcast so the join must pick sort-merge; bucketed
    # inputs then need no shuffle at all
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", ["o_custkey"])
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # same result as the plain join
        plain = orders.join(cust, "o_custkey").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_agg_count_matches_plain(spark):
    ev = table(spark, SF_SMOKE, "events")
    plain = {r["event_type"]: r["count"] for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("count")).collect()}
    salted = {r["event_type"]: r["count"] for r in
              salted_agg_count(ev, ["event_type"]).collect()}
    assert salted == plain


def test_salted_join_matches_plain(spark):
    orders = table(spark, SF_SMOKE, "orders")
    cust = table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_join(orders, cust, ["o_custkey"]).count()
    assert salted == plain
