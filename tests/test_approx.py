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
