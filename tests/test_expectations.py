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


def test_fk_relationship_violation_detected(spark):
    """dbt `relationships` twin (reference dbt/job_dbt/models/marts/
    schema.yml: fact_jobs.company_id -> dim_companies.company_id): a child
    key with no parent is a violation; NULL child keys are not (dbt
    semantics — nullability is the separate not_null test)."""
    from job_etl_spark.operators.dq import check_relationships

    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "job_id INT, company_id INT"
    )
    dim = spark.createDataFrame([(10,), (20,)], "company_id INT")
    bad = check_relationships(fact, "company_id", dim, "company_id")
    assert [r.job_id for r in bad.collect()] == [3]


def test_run_dq_reports_fk_violations(spark, tmp_path):
    """e2e: run_dq must include the relationship check and count orphans."""
    from job_etl_spark.pipeline.runner import TableStore, run_dq, run_pipeline

    stats = run_pipeline(spark, warehouse=str(tmp_path / "wh"), num_jobs=20)
    store = TableStore(spark, stats["warehouse"])
    fact = store.read("fact_jobs")
    # orphan a company_id: point one row at a key no dim row has
    broken = fact.withColumn(
        "company_id",
        F.when(F.row_number().over(__import__("pyspark").sql.Window.orderBy("hash_key")) == 1,
               F.lit("__orphan__")).otherwise(F.col("company_id")),
    )
    store.rewrite("fact_jobs", broken)
    results = {r.name: r for r in run_dq(store)}
    rel = results["fact_jobs.company_id.relationship"]
    assert rel.violations == 1 and not rel.passed
