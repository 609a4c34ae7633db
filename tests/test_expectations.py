"""Failure-path contract for the declarative DQ operator: a violated
constraint must surface as passed=false with the measured value (the
oracle-paired q124 only exercises the all-green path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_etl_spark.operators.expectations import Check, dq_report


def test_violated_constraint_reports_failure(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a"), (3, "b"), (3, "c")], "id INT, name STRING"
    )
    checks = [
        Check(
            "completeness_name",
            F.round(
                F.count("name").cast("decimal(30,8)") / F.count(F.lit(1)), 6
            ).cast("double"),
            "",
            1.0,
            1.0,
        ),
        Check(
            "uniqueness_id",
            F.round(
                F.countDistinct("id").cast("decimal(30,8)") / F.count(F.lit(1)), 6
            ).cast("double"),
            "",
            1.0,
            1.0,
        ),
        Check(
            "range_id",
            F.round(
                F.count(F.when((F.col("id") >= 1) & (F.col("id") <= 10), 1)).cast(
                    "decimal(30,8)"
                )
                / F.count(F.lit(1)),
                6,
            ).cast("double"),
            "",
            1.0,
            1.0,
        ),
    ]
    rows = {r["check"]: r for r in dq_report(df, checks).collect()}
    assert rows["completeness_name"]["passed"] is False
    assert rows["completeness_name"]["value"] == 0.75
    assert rows["uniqueness_id"]["passed"] is False
    assert rows["range_id"]["passed"] is True


def test_single_pass_plan(spark):
    """All metrics must come from ONE aggregation over the input — no
    per-check jobs/scans."""
    df = spark.createDataFrame([(1, "a")], "id INT, name STRING")
    checks = [
        Check("c1", F.count("name").cast("double"), "", 0.0, 10.0),
        Check("c2", F.count(F.lit(1)).cast("double"), "", 0.0, 10.0),
    ]
    plan = dq_report(df, checks)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1
