"""Session-timezone independence: the driver runs a VANILLA SparkSession
(machine-local tz, not get_spark's pinned UTC), so every time-touching
query must produce identical results under any session tz. Outputs are
epoch-integer or TIMESTAMP_NTZ by design (queries._util rules); this
locks the claim in under the strongest probe — a fractional-offset zone
where date_trunc/window bucketing shifts by 30 minutes if any expression
leaks through the session tz."""

from __future__ import annotations

import pytest

from job_etl_spark.queries import registry
from job_etl_spark.testing import check_query
from tests.conftest import SF_SMOKE

_REG = registry()

# curated core: every query whose plan touches events.ts or an order
# date arithmetic (hand-audited when the suite was written)
_TIME_FAMILY = [
    "q09_watermark_incremental",
    "q33_recent_events",
    "q34_sessionize",
    "q36_hourly_rollup",
    "q37_asof_join",
    "q44_interval_join",
    "q61_trailing_hour_window",
    "q63_funnel_detection",
    "q82_gap_filled_hours",
    "q89_scd2_history",
    "q94_snapshot_diff",
    "q105_windowed_distinct",
    "q120_compaction_plan",
    "q125_ewma_smoothing",
    "q131_ivm_agg",
    "q133_cohort_matrix",
    "q136_ewma_segmented",
    "q137_sessions_segmented",
    "q149_seasonal_profile",
    "q150_cusum_changepoint",
    "q151_activity_streaks",
]


def _detected_time_family() -> list[str]:
    """Auto-enroll any query whose SOURCE touches the events table or a
    timestamp-rendering builtin — a new time-touching query must pass the
    fractional-offset probe without anyone remembering to list it here.
    (r7 audit: the 21 queries this regex adds beyond the curated core all
    passed first try; the guard exists so that stays true.)

    r7 ADVICE: the scan also covers same-module private helpers the fn
    references (via the rotation's dependency closure) and any query
    depending on ``functions/timeparse.py`` — the one module whose whole
    purpose is timestamp parsing. Scanning ALL closure module files is
    deliberately avoided: ``tables.py`` matches the regex incidentally
    (every query depends on it), which would enroll the full registry and
    drown the probe."""
    import inspect
    import re

    from job_etl_spark import queries as qmod

    pat = re.compile(r'"events"|unix_micros|date_trunc|to_timestamp|window\(')

    def touches_time(q) -> bool:
        if pat.search(inspect.getsource(q.fn)):
            return True
        local_srcs, mods = qmod._dependency_closure(q.fn)
        return any(pat.search(s) for s in local_srcs) or (
            "job_etl_spark.functions.timeparse" in mods
        )

    return sorted(
        n for n, q in _REG.items() if n not in _TIME_FAMILY and touches_time(q)
    )


@pytest.mark.parametrize("name", _TIME_FAMILY + _detected_time_family())
def test_time_query_matches_oracle_in_fractional_tz(spark, name):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")  # UTC+5:30
    try:
        q = _REG[name]
        res = check_query(spark, SF_SMOKE, name, q.fn, q.oracle)
        assert res.ok, f"{name} under Asia/Kolkata: {res.detail}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
