"""S11 export: Hyper column-type inference (exporter.py:30-41 semantics)
and the sidecar artifact."""

from __future__ import annotations

import json

import pytest

from job_etl_spark.pipeline.report import export_tables, hyper_schema

pytestmark = pytest.mark.smoke


def test_hyper_schema_inference(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x", True, None)],
        "a int, b double, c string, d boolean, e timestamp",
    ).selectExpr("a", "b", "c", "d", "e", "CAST(1.5 AS DECIMAL(12,2)) AS f")
    assert hyper_schema(df) == {
        "a": "double",
        "b": "double",
        "c": "text",
        "d": "text",
        "e": "text",
        "f": "double",
    }


def test_export_writes_schema_sidecar(spark, tmp_path):
    fact = spark.createDataFrame([(1, "t", 9.5)], "job_id int, title string, rank_score double")
    dim = spark.createDataFrame([("c1", 4)], "company_id string, rating int")
    out = export_tables(fact, dim, str(tmp_path))
    assert out["hyper_schema"]["fact_jobs"]["rank_score"] == "double"
    with open(tmp_path / "hyper_schema.json") as f:
        side = json.load(f)
    assert side == out["hyper_schema"]
    assert side["dim_companies"] == {"company_id": "text", "rating": "double"}
