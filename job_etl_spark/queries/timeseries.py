"""Time-series analytics tranche: the monitoring operators a platform
team points at an event stream — seasonal profiling (what does "normal"
look like per hour-of-week), CUSUM changepoint localization (when did
the level shift), and gaps-and-islands activity streaks (per-entity
engagement runs).

All bucketing is tz-free integer arithmetic on epoch-microseconds
(day = µs div 86 400e6, hour-of-day = µs div 3 600e6 mod 24, dow =
(epoch_day + 4) mod 7 with 0 = Sunday — 1970-01-01 was a Thursday), so
results are identical under any session timezone — the repo-wide events
discipline (queries/__init__ docstring).

Scale shapes: q149 is one groupBy + a window over the 840-row aggregate;
q150 windows over per-(type, hour) aggregates (rows = types × hours, not
events); q151's windows partition by user_id — the natural key, skew-safe
under AQE. No driver materialization anywhere.

Reference tie-in: extends the reference's job_posting_stats reporting
surface (scripts/bootstrap_db.sql:186-196) with the stream-shaped
monitors it lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from job_etl_spark.queries._util import Query, dround
from job_etl_spark.tables import table

QUERIES: dict[str, Query] = {}

_US_HOUR = 3_600_000_000
_US_DAY = 86_400_000_000


def _us(c: F.Column) -> F.Column:
    return F.unix_micros(c)


# ---------------------------------------------------------------------------
# q149 — seasonal profile: per (event_type, day-of-week, hour-of-day)
# traffic and value vs the event type's overall average. The deviation
# column is what an anomaly monitor thresholds ("purchases are 40% below
# the Tuesday-10am norm").
#
# Cell averages and the per-type overall average both come from exact
# decimal sums; the overall average is a WINDOW over the aggregated
# frame (no second scan of events), summing the cell-level decimal sums
# — exact because decimal addition is associative.
# ---------------------------------------------------------------------------
def q149_seasonal_profile(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    us = _us(F.col("ts"))
    day = (us / _US_DAY).cast("bigint")
    cells = (
        ev.select(
            "event_type",
            ((day + 4) % 7).alias("dow"),
            ((us / _US_HOUR).cast("bigint") % 24).alias("hour"),
            "value",
        )
        .groupBy("event_type", "dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("_sum"),
        )
    )
    w = Window.partitionBy("event_type")
    # divisions in IEEE double then decimal-rounded: Spark's decimal
    # division rounds the exact rational while DuckDB's falls to DOUBLE —
    # an exact .5 at the round digit flips between the two
    avg_cell = dround(F.col("_sum").cast("double") / F.col("n_events"), 6)
    avg_type = dround(
        F.sum("_sum").over(w).cast("double") / F.sum("n_events").over(w), 6
    )
    return cells.select(
        "event_type",
        "dow",
        "hour",
        "n_events",
        avg_cell.alias("avg_value"),
        dround(avg_cell - avg_type, 6).alias("deviation"),
    )


_Q149_SQL = f"""
WITH cells AS (
  SELECT event_type,
    ((epoch_us(ts) // {_US_DAY}) + 4) % 7 AS dow,
    (epoch_us(ts) // {_US_HOUR}) % 24 AS hour,
    COUNT(*) AS n_events,
    SUM(CAST(value AS DECIMAL(30,6))) AS _sum
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, dow, hour, n_events,
  CAST(ROUND(CAST(CAST(_sum AS DOUBLE) / n_events AS DECIMAL(24,10)), 6)
    AS DOUBLE) AS avg_value,
  CAST(ROUND(CAST(
    CAST(ROUND(CAST(CAST(_sum AS DOUBLE) / n_events AS DECIMAL(24,10)), 6)
      AS DOUBLE)
    - CAST(ROUND(CAST(CAST(SUM(_sum) OVER w AS DOUBLE) / SUM(n_events) OVER w
      AS DECIMAL(24,10)), 6) AS DOUBLE)
  AS DECIMAL(24,10)), 6) AS DOUBLE) AS deviation
FROM cells
WINDOW w AS (PARTITION BY event_type)
"""


# ---------------------------------------------------------------------------
# q150 — CUSUM changepoint localization: per event type, the hourly
# volume series' cumulative deviation from its mean; the |CUSUM| peak is
# the most likely level-shift point (Page's classic test, argmax form).
#
# Two shuffles total: events → (type, hour) counts, then windows over the
# per-type hourly series (rows = types × hours). CUSUM is a running sum
# of exact decimals (count − decimal mean), so the peak position is
# engine-exact — no float accumulation drift.
# ---------------------------------------------------------------------------
def q150_cusum_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    hour_us = ((_us(F.col("ts")) / _US_HOUR).cast("bigint") * _US_HOUR).alias(
        "bucket_us"
    )
    hourly = ev.select("event_type", hour_us).groupBy(
        "event_type", "bucket_us"
    ).agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("event_type")
    mean = F.round(
        (
            F.sum(F.col("n").cast("decimal(30,8)")).over(wt).cast("double")
            / F.count(F.lit(1)).over(wt)
        ).cast("decimal(26,14)"),
        8,
    ).cast("double")
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = F.sum((F.col("n") - F.col("_mean")).cast("decimal(30,12)")).over(wrun)
    scored = (
        hourly.withColumn("_mean", mean)
        .withColumn("cusum", cusum)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.abs(F.col("cusum")).desc(), F.col("bucket_us")
                )
            ),
        )
    )
    return scored.where(F.col("rn") == 1).select(
        "event_type",
        F.col("bucket_us").alias("changepoint_us"),
        F.round(F.abs(F.col("cusum")), 4).cast("double").alias("max_abs_cusum"),
    )


_Q150_SQL = f"""
WITH hourly AS (
  SELECT event_type,
    (epoch_us(ts) // {_US_HOUR}) * {_US_HOUR} AS bucket_us,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
), dev AS (
  SELECT event_type, bucket_us, n,
    CAST(ROUND(CAST(
      CAST(SUM(CAST(n AS DECIMAL(30,8))) OVER (PARTITION BY event_type)
        AS DOUBLE) / COUNT(*) OVER (PARTITION BY event_type)
    AS DECIMAL(26,14)), 8) AS DOUBLE) AS _mean
  FROM hourly
), run AS (
  SELECT event_type, bucket_us,
    SUM(CAST(n - _mean AS DECIMAL(30,12))) OVER (
      PARTITION BY event_type ORDER BY bucket_us
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM dev
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY abs(cusum) DESC, bucket_us) AS rn
  FROM run
)
SELECT event_type, bucket_us AS changepoint_us,
  CAST(ROUND(abs(cusum), 4) AS DOUBLE) AS max_abs_cusum
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q151 — activity streaks (gaps-and-islands): per user, runs of
# consecutive active days; output the distribution of longest streaks.
# The classic island key is day − row_number(): constant within a
# consecutive run, distinct across gaps.
#
# Scale shape: dedup to (user, day) first (events → active-day set is the
# big reduction), then three user-keyed windows/aggregations over the
# small per-day frame. All shuffles keyed on user_id.
# ---------------------------------------------------------------------------
def q151_activity_streaks(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    days = (
        ev.select(
            "user_id", (_us(F.col("ts")) / _US_DAY).cast("bigint").alias("day")
        )
        .distinct()
    )
    wd = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "grp", F.col("day") - F.row_number().over(wd)
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak")
    )
    return longest.groupBy("longest_streak").agg(
        F.count(F.lit(1)).alias("n_users")
    )


_Q151_SQL = f"""
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_DAY} AS day FROM events
), islands AS (
  SELECT user_id, day,
    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, COUNT(*) AS streak_len FROM islands GROUP BY 1, 2
), longest AS (
  SELECT user_id, MAX(streak_len) AS longest_streak FROM streaks GROUP BY 1
)
SELECT longest_streak, COUNT(*) AS n_users FROM longest GROUP BY 1
"""


QUERIES.update(
    {
        "q149_seasonal_profile": Query(q149_seasonal_profile, _Q149_SQL),
        "q150_cusum_changepoint": Query(q150_cusum_changepoint, _Q150_SQL),
        "q151_activity_streaks": Query(q151_activity_streaks, _Q151_SQL),
    }
)
