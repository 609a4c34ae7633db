"""The UDAF seam must agree with the native computation: a pandas
GROUPED_AGG trimmed mean vs the two-pass percentile-bound + decimal-avg
native plan (q83's shape)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from job_etl_spark.operators.udaf import grouped_agg, pandas_agg
from job_etl_spark.tables import table

SF = "/root/testdata/sf0.001"


def _make_trimmed_mean():
    # defined inside a function so cloudpickle ships it BY VALUE — a
    # module-top-level fn pickles by reference and the executor can't
    # import the tests package
    def _trimmed_mean(v: pd.Series) -> float:
        lo, hi = v.quantile(0.05), v.quantile(0.95)
        kept = v[(v >= lo) & (v <= hi)]
        return float(kept.mean())

    return _trimmed_mean


def test_pandas_grouped_agg_matches_native(spark):
    ev = table(spark, SF, "events").select("event_type", "value")

    custom = grouped_agg(
        ev,
        ["event_type"],
        {"trimmed": pandas_agg(_make_trimmed_mean(), "value")},
    )
    got = {r["event_type"]: r["trimmed"] for r in custom.collect()}

    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    native = (
        ev.join(F.broadcast(bounds), "event_type")
        .where((F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")))
        .groupBy("event_type")
        .agg(F.avg("value").alias("trimmed"))
    )
    want = {r["event_type"]: r["trimmed"] for r in native.collect()}

    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_pandas_agg_is_arrow_batched_not_per_row(spark):
    """The seam must plan as an AggregateInPandas (Arrow batches), never
    a row-at-a-time PythonUDF."""
    ev = table(spark, SF, "events").select("event_type", "value")
    df = grouped_agg(
        ev, ["event_type"], {"m": pandas_agg(_make_trimmed_mean(), "value")}
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AggregateInPandas" in plan or "ArrowAggregatePython" in plan, plan[:1500]
    assert "BatchEvalPython" not in plan, plan[:1500]
