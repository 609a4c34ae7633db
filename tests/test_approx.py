"""q35 approx distinct: HLL estimate within 5% of exact (no cross-engine
oracle by design — sketch implementations differ)."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_etl_spark.queries.relational import q35_approx_distinct
from job_etl_spark.tables import table
from tests.conftest import SF_ORACLE


def test_approx_distinct_within_tolerance(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q35_approx_distinct(spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(1, 0.05 * exact[k]), (k, approx[k], exact[k])
