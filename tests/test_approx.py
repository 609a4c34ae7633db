"""q35 approx distinct: the query emits its own ±5% accuracy claim
(hash-checked against the oracle); this test additionally asserts the
numeric HLL gap directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_etl_spark.tables import table
from tests.conftest import SF_ORACLE


def test_approx_distinct_within_tolerance(spark):
    ev = table(spark, SF_ORACLE, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.05 * r["exact"]), (
            r["event_type"],
            r["approx"],
            r["exact"],
        )


def test_q132_profile_approx_ndv(spark):
    """q132's approx=True must (a) stay within HLL tolerance of the exact
    NDVs and (b) drop the Expand duplication exact countDistinct plans —
    the 100 TB cost driver for N-column profiling."""
    from job_etl_spark.queries.observability import q132_profile_table

    exact = {r["column"]: r["ndv"] for r in q132_profile_table(spark, SF_ORACLE).collect()}
    approx_df = q132_profile_table(spark, SF_ORACLE, approx=True)
    approx = {r["column"]: r["ndv"] for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for c, e in exact.items():
        assert abs(approx[c] - e) <= max(2, 0.15 * e), (c, approx[c], e)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = (
        q132_profile_table(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan  # the cost the flag removes
