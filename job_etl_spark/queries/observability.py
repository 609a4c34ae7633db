"""Engine-observability tranche 6: the operators a platform team runs
ON the warehouse rather than in a product query — report reshaping
(unpivot), declarative data-quality verification (single-pass Deequ-style
constraint report), and EWMA metric smoothing (the drift detector behind
freshness/volume monitors).

Same parity rules as the rest of the inventory (queries._util). The EWMA
fold is pure per-element IEEE double arithmetic in a fixed left-fold
order — verified bit-exact between Spark's ``aggregate`` and DuckDB's
``list_reduce`` — so it needs no rounding guard until the final output
round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from job_etl_spark.ml.dedup import hexint
from job_etl_spark.operators.expectations import Check, dq_report, dq_report_sql
from job_etl_spark.queries._util import Query, dround, sql_dround
from job_etl_spark.functions.chunking import tokens_expr
from job_etl_spark.tables import parallel_table, table

_SQL_HEXINT = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"

# ---------------------------------------------------------------------------
# q123 — UNPIVOT (wide metrics → long): the inverse of q42's pivot and
# the standard last step before a generic metrics sink (one row per
# (entity, metric)). Spark `unpivot` ≡ DuckDB UNPIVOT; value columns are
# cast to a common DOUBLE first, exactly as both engines require.
#
# Scale shape: unpivot is a map-side row expansion (×3 here) over an
# already-aggregated frame — no shuffle beyond the feeding aggregate.
# ---------------------------------------------------------------------------


def q123_unpivot_metrics(spark: SparkSession, sf: str) -> DataFrame:
    wide = (
        table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("total_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_price", "max_price"],
        "metric",
        "val",
    )


_Q123_SQL = """
WITH wide AS (
  SELECT o_orderpriority,
    CAST(COUNT(*) AS DOUBLE) AS n_orders,
    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_price,
    MAX(o_totalprice) AS max_price
  FROM orders GROUP BY o_orderpriority
)
UNPIVOT wide ON n_orders, total_price, max_price INTO NAME metric VALUE val
"""


# ---------------------------------------------------------------------------
# q124 — declarative DQ constraint report (operators/expectations.py):
# completeness, exact uniqueness, range conformance, and domain
# membership over orders — every metric from ONE aggregation pass, then
# a map-side reshape to the long (check, value, passed) frame. The
# operator is the engine feature; this query is its contract.
# ---------------------------------------------------------------------------


# (name, metric-Column builder, sql twin, lo, hi) — builders are thunks so
# no Column is constructed before a SparkSession exists (oracle SQL is
# rendered at import time; Columns only inside the query call)
def _ratio(cond: "F.Column") -> "F.Column":
    # counts are exact in double ≤ 2^53; IEEE divide then decimal-round —
    # a DECIMAL÷COUNT division rounds differently in Spark vs DuckDB
    return F.round(
        (F.count(F.when(cond, 1)).cast("double") / F.count(F.lit(1))).cast(
            "decimal(24,10)"
        ),
        6,
    ).cast("double")


_Q124_SPECS: list[tuple] = [
    (
        "completeness_orderdate",
        lambda: _ratio(F.col("o_orderdate").isNotNull()),
        "CAST(ROUND(CAST(CAST(COUNT(CASE WHEN o_orderdate IS NOT NULL THEN 1 END) AS DOUBLE) / COUNT(*) AS DECIMAL(24,10)), 6) AS DOUBLE)",
        0.999,
        1.0,
    ),
    (
        "uniqueness_orderkey",
        lambda: F.round(
            (
                F.countDistinct("o_orderkey").cast("double") / F.count(F.lit(1))
            ).cast("decimal(24,10)"),
            6,
        ).cast("double"),
        "CAST(ROUND(CAST(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*) AS DECIMAL(24,10)), 6) AS DOUBLE)",
        1.0,
        1.0,
    ),
    (
        "range_totalprice",
        lambda: _ratio((F.col("o_totalprice") > 0) & (F.col("o_totalprice") < 1e6)),
        "CAST(ROUND(CAST(CAST(COUNT(CASE WHEN o_totalprice > 0 AND o_totalprice < 1e6 THEN 1 END) AS DOUBLE) / COUNT(*) AS DECIMAL(24,10)), 6) AS DOUBLE)",
        1.0,
        1.0,
    ),
    (
        "domain_orderstatus",
        lambda: _ratio(F.col("o_orderstatus").isin("O", "F", "P")),
        "CAST(ROUND(CAST(CAST(COUNT(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END) AS DOUBLE) / COUNT(*) AS DECIMAL(24,10)), 6) AS DOUBLE)",
        1.0,
        1.0,
    ),
]


def _q124_checks() -> list[Check]:
    return [Check(n, mk(), sql, lo, hi) for n, mk, sql, lo, hi in _Q124_SPECS]


def _q124_sql_checks() -> list[Check]:
    return [Check(n, None, sql, lo, hi) for n, _mk, sql, lo, hi in _Q124_SPECS]


def q124_dq_report(spark: SparkSession, sf: str) -> DataFrame:
    return dq_report(table(spark, sf, "orders"), _q124_checks())


# ---------------------------------------------------------------------------
# q125 — EWMA smoothing per entity (the drift/freshness monitor: an
# exponentially-weighted mean that a platform alert compares against the
# live value). One grouped collect per user — the classic distributed
# shape for an inherently-sequential per-key fold (precedent: q77
# packing, q108 OLS): the array is sorted by the total order (ts,
# event_id) INSIDE the group, then folded left with s₁ = x₁,
# sₙ = α·xₙ + (1−α)·sₙ₋₁. Group size is bounded by events-per-entity
# (not corpus size), so the collect_list is not a scale hazard.
# ---------------------------------------------------------------------------
_Q125_ALPHA = 0.2


def q125_ewma_smoothing(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id", "value"
    )
    grouped = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts_us", "event_id", "value"))
        ).alias("seq"),
    )
    vals = F.transform("seq", lambda s: s["value"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda s, x: F.lit(_Q125_ALPHA) * x + F.lit(1 - _Q125_ALPHA) * s,
    )
    return grouped.select(
        "user_id",
        F.size("seq").alias("n_events"),
        dround(ewma, 6).alias("ewma"),
        dround(F.element_at(vals, -1), 6).alias("last_value"),
    )


_Q125_SQL = f"""
WITH seq AS (
  SELECT user_id,
    list(value ORDER BY epoch_us(ts), event_id) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id, len(vals) AS n_events,
  {sql_dround(f"list_reduce(vals, (s, x) -> {_Q125_ALPHA}*x + {1 - _Q125_ALPHA}*s)", 6)}
    AS ewma,
  {sql_dround("vals[-1]", 6)} AS last_value
FROM seq
"""


QUERIES: dict[str, Query] = {
    "q123_unpivot_metrics": Query(q123_unpivot_metrics, _Q123_SQL),
    "q124_dq_report": Query(
        q124_dq_report, dq_report_sql("orders", _q124_sql_checks())
    ),
    "q125_ewma_smoothing": Query(q125_ewma_smoothing, _Q125_SQL),
}


# ---------------------------------------------------------------------------
# q130 — join-key skew report (the diagnosis that precedes q62's salting
# and AQE skew-join tuning): per candidate join key, its NDV, max/total
# frequency, and the share of rows carried by the top-10 keys. One
# partial-agg'd count per key + one tiny window over the aggregate.
# ---------------------------------------------------------------------------
def q130_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    # Totals and the top-10 mass are both bounded aggregates; ranking every
    # key through one unpartitioned window task would serialize on NDV.
    totals = per_key.agg(
        F.count(F.lit(1)).alias("ndv"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_freq"),
    )
    top10 = (
        per_key.orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
        .agg(F.sum("n").alias("top10_n"))
    )
    return totals.crossJoin(top10).select(
        "ndv",
        "n_rows",
        "max_freq",
        F.round(
            F.col("max_freq").cast("decimal(30,8)") * F.col("ndv") / F.col("n_rows"),
            6,
        )
        .cast("double")
        .alias("skew_factor"),
        F.round(F.col("top10_n").cast("decimal(30,8)") / F.col("n_rows"), 6)
        .cast("double")
        .alias("top10_share"),
    )


_Q130_SQL = """
WITH per_key AS (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
), ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, user_id ASC) AS rk FROM per_key
)
SELECT COUNT(*) AS ndv, CAST(SUM(n) AS BIGINT) AS n_rows, MAX(n) AS max_freq,
  CAST(ROUND(CAST(MAX(n) AS DECIMAL(30,8)) * COUNT(*) / SUM(n), 6) AS DOUBLE)
    AS skew_factor,
  CAST(ROUND(CAST(SUM(CASE WHEN rk <= 10 THEN n END) AS DECIMAL(30,8)) / SUM(n), 6)
    AS DOUBLE) AS top10_share
FROM ranked
"""


# ---------------------------------------------------------------------------
# q131 — incremental aggregate maintenance (IVM): maintain a per-type
# rollup as base ⊕ delta instead of recomputing — the algebra behind
# every incremental mart refresh (reference: the watermark-incremental
# normalize feeding marts). The query SPLITS events at a watermark,
# aggregates each side independently, and re-merges by re-summing the
# partials (count/sum re-aggregate exactly; avg re-derives from them).
# The oracle aggregates the FULL table directly — a hash match proves
# base ⊕ delta ≡ recompute for this algebra.
# ---------------------------------------------------------------------------
_Q131_CUT = "2024-01-20 00:00:00"


def q131_ivm_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "event_type", "value", F.unix_micros("ts").alias("ts_us")
    )
    import datetime as _dt

    cut_us = int(
        (
            _dt.datetime.fromisoformat(_Q131_CUT) - _dt.datetime(1970, 1, 1)
        ).total_seconds()
        * 1_000_000
    )

    def _partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("sv"),
        )

    base = _partial(ev.where(F.col("ts_us") < cut_us))
    delta = _partial(ev.where(F.col("ts_us") >= cut_us))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n_events"), F.sum("sv").alias("sv"))
    )
    return merged.select(
        "event_type",
        "n_events",
        F.round("sv", 2).cast("double").alias("total_value"),
        F.round(
            (F.col("sv").cast("double") / F.col("n_events")).cast("decimal(24,10)"), 6
        )
        .cast("double")
        .alias("avg_value"),
    )


_Q131_SQL = """
SELECT event_type, COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_value,
  CAST(ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
    AS DECIMAL(24,10)), 6) AS DOUBLE) AS avg_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q132 — column profiling (the ANALYZE TABLE statistics a cost-based
# planner and a data catalog both consume): per column, NDV, null count,
# and min/max rendered to text. ONE aggregation pass computes every
# per-column statistic, then a map-side literal explode reshapes to long
# — same one-pass shape as q124.
#
# The declared (oracle-paired) query uses exact NDV; at 100 TB exact
# NDV×N-columns is the cost driver (each countDistinct adds an Expand
# duplication of the scan rows), so ``approx=True`` swaps every NDV to
# approx_count_distinct (HyperLogLog++, mergeable, no Expand — the same
# one-pass map-side-partial shape as plain aggregates). Accuracy- and
# plan-asserted in tests/test_approx.py.
#
# The trade, MEASURED at 64× orders (9.6M rows, SCALING.md r7): exact is
# 1.97× slower than approx (11.47 s vs 5.81 s, min-of-3) and the gap
# widens with scale (the Expand's duplicated rows are also shuffled);
# approx's max relative NDV error was 5.06% at rsd=0.05. Policy: exact
# NDV is the sf-bounded demo / oracle twin; ``approx=True`` is the
# production path at 100 TB.
# ---------------------------------------------------------------------------
_Q132_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def q132_profile_table(
    spark: SparkSession, sf: str, approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    df = table(spark, sf, "orders").select(*_Q132_COLS)
    ndv = (lambda c: F.approx_count_distinct(c, rsd)) if approx else F.countDistinct
    # Two single-row aggregates instead of one (r11, guide §2.3/§5): mixing
    # the exact-NDV arms with min/max(string) put variable-length buffers in
    # the multi-distinct Expand rewrite, forcing SortAggregate — a full sort
    # of the 6×N expanded rows before BOTH aggregation phases. Split, the
    # NDV pass keeps fixed-width buffers (HashAggregate over the Expand,
    # partial dedup before the shuffle) and the min/max/null pass is a plain
    # sortless global aggregate; the extra column-pruned scan is far cheaper
    # than sorting a 6× row expansion at any scale. The 1×1-row cross join
    # reassembles the profile row; results are column-identical.
    ndv_row = df.agg(*[ndv(c).alias(f"{c}__ndv") for c in _Q132_COLS])
    stat_aggs = []
    for c in _Q132_COLS:
        stat_aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    one = ndv_row.crossJoin(df.agg(*stat_aggs))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__ndv").alias("ndv"),
                F.col(f"{c}__nulls").alias("n_null"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in _Q132_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def _q132_sql() -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS \"column\", COUNT(DISTINCT {c}) AS ndv, "
        f"COUNT(*) - COUNT({c}) AS n_null, "
        f"MIN(CAST({c} AS VARCHAR)) AS min_str, MAX(CAST({c} AS VARCHAR)) AS max_str "
        f"FROM orders"
        for c in _Q132_COLS
    )
    return arms


QUERIES.update(
    {
        "q130_skew_report": Query(q130_skew_report, _Q130_SQL),
        "q131_ivm_agg": Query(q131_ivm_agg, _Q131_SQL),
        "q132_profile_table": Query(q132_profile_table, _q132_sql()),
    }
)


# ---------------------------------------------------------------------------
# q133 — cohort retention matrix (product-analytics standard): users are
# cohorted by first-seen week; each later active week increments the
# (cohort, offset) cell. Two shuffles total: the per-user first-seen
# aggregate (map-side combined) and the distinct (cohort, offset, user)
# collapse feeding the final count — both on bounded keys.
# ---------------------------------------------------------------------------
_Q133_WEEK_US = 7 * 86_400 * 1_000_000


def q133_cohort_matrix(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id", (F.unix_micros("ts") / _Q133_WEEK_US).cast("bigint").alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = (
        ev.join(first, "user_id")
        .select("user_id", "cohort_week", (F.col("week") - F.col("cohort_week")).alias("offset_weeks"))
        .distinct()
    )
    return act.groupBy("cohort_week", "offset_weeks").agg(
        F.countDistinct("user_id").alias("n_users")
    )


_Q133_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch_us(ts) / {_Q133_WEEK_US}) AS BIGINT) AS week
  FROM events
), first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
), act AS (
  SELECT DISTINCT ev.user_id, cohort_week, week - cohort_week AS offset_weeks
  FROM ev JOIN first USING (user_id)
)
SELECT cohort_week, offset_weeks, COUNT(DISTINCT user_id) AS n_users
FROM act GROUP BY cohort_week, offset_weeks
"""


# ---------------------------------------------------------------------------
# q134 — order-insensitive table checksum (replication / migration
# reconciliation): Σ md5-hash of each row's key column tuple, as an
# exact DECIMAL(38,0) — commutative, so partition order, file order, and
# engine never matter, and two replicas compare with ONE scan each + an
# 8-byte exchange. Columns are integer/char-rendered (no raw double →
# string, whose rendering is engine-specific). The exact sum is reduced
# mod 2^61-1 to a BIGINT so the output type survives the driver's pandas
# canonicalization (DECIMAL/HUGEINT render as object/float64 there); the
# mod loses no reconciliation power for a checksum.
# ---------------------------------------------------------------------------
_CHECKSUM_MOD = (1 << 61) - 1
def q134_table_checksum(spark: SparkSession, sf: str) -> DataFrame:
    # parallel_table: one md5 per row over the single-row-group sf0.1
    # file otherwise runs in ONE scan task (q01's note; no-op at scale)
    li = parallel_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    row_hash = hexint(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_partkey").cast("string"),
            F.col("l_suppkey").cast("string"),
            "l_returnflag",
            "l_linestatus",
            F.col("qty").cast("string"),
        )
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(row_hash.cast("decimal(38,0)")) % F.lit(_CHECKSUM_MOD))
        .cast("bigint")
        .alias("checksum"),
    )


_Q134_SQL = f"""
SELECT COUNT(*) AS n_rows,
  CAST(SUM(CAST({_SQL_HEXINT.format(expr=(
      "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR) || '|' || "
      "CAST(l_suppkey AS VARCHAR) || '|' || l_returnflag || '|' || l_linestatus "
      "|| '|' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)"
  ))} AS DECIMAL(38,0))) % {_CHECKSUM_MOD} AS BIGINT) AS checksum
FROM lineitem
"""


# ---------------------------------------------------------------------------
# q135 — grouped MODE (most frequent value per group, deterministic
# smallest-value tie-break): the one classic aggregate the inventory
# lacked. Count-then-rank — two hash aggs and a per-group window over the
# ALREADY-AGGREGATED (group, value) frame, never over raw rows.
# ---------------------------------------------------------------------------
def q135_grouped_mode(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    counts = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("mode_user"),
            F.col("n").alias("mode_count"),
        )
    )


_Q135_SQL = """
WITH counts AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2
)
SELECT event_type, user_id AS mode_user, n AS mode_count FROM (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY n DESC, user_id ASC) AS rk
  FROM counts
) WHERE rk = 1
"""


QUERIES.update(
    {
        "q133_cohort_matrix": Query(q133_cohort_matrix, _Q133_SQL),
        "q134_table_checksum": Query(q134_table_checksum, _Q134_SQL),
        "q135_grouped_mode": Query(q135_grouped_mode, _Q135_SQL),
    }
)


# ---------------------------------------------------------------------------
# q136 — SEGMENTED-scan EWMA: the mitigation SCALING.md promises for
# per-key ordered operators on a hot entity. The linear recurrence
# s' = α·x + (1−α)·s is a composable affine map, so each calendar chunk
# (week) folds INDEPENDENTLY to a summary (s_c = chunk EWMA from zero
# init, d_c = (1−α)^len decay), and per entity only the ≤C chunk
# summaries merge sequentially: s = s_c + d_c·s_prev. A 90%-hot user's
# timeline parallelizes across its weeks instead of serializing in one
# task — the parallel-prefix treatment of linear recurrences.
#
# Zero-init convention (s₀ = 0): the segmented merge is exact for it,
# and it is the standard monitoring EWMA. Every fold is plain per-row
# IEEE double arithmetic in a fixed order — bit-identical to the
# DuckDB twin's list_reduce with prepended neutral elements.
# ---------------------------------------------------------------------------
_Q136_ALPHA = 0.2
_Q136_CHUNK_US = 7 * 86_400 * 1_000_000


def q136_ewma_segmented(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
        (F.unix_micros("ts") / _Q136_CHUNK_US).cast("bigint").alias("chunk"),
    )
    a, b = F.lit(_Q136_ALPHA), F.lit(1 - _Q136_ALPHA)
    per_chunk = ev.groupBy("user_id", "chunk").agg(
        F.array_sort(F.collect_list(F.struct("ts_us", "event_id", "value"))).alias(
            "seq"
        )
    )
    vals = F.transform("seq", lambda s: s["value"])
    s_c = F.aggregate(vals, F.lit(0.0), lambda s, x: a * x + b * s)
    d_c = F.aggregate(vals, F.lit(1.0), lambda s, _x: s * b)
    per_chunk = per_chunk.select(
        "user_id",
        "chunk",
        F.size("seq").alias("n_c"),
        s_c.alias("s_c"),
        d_c.alias("d_c"),
    )
    merged = per_chunk.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("chunk", "s_c", "d_c"))).alias("cs"),
        F.sum("n_c").alias("n_events"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    ewma = F.aggregate(
        F.col("cs"),
        F.struct(F.lit(0.0).alias("s"), F.lit(1.0).alias("d")),
        lambda acc, e: F.struct(
            (e["s_c"] + e["d_c"] * acc["s"]).alias("s"), F.lit(1.0).alias("d")
        ),
    )["s"]
    return merged.select(
        "user_id", "n_events", "n_chunks", dround(ewma, 6).alias("ewma")
    )


_Q136_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
    CAST(floor(epoch_us(ts) / {_Q136_CHUNK_US}) AS BIGINT) AS chunk
  FROM events
), per_chunk AS (
  SELECT user_id, chunk,
    list(value ORDER BY ts_us, event_id) AS vals
  FROM ev GROUP BY user_id, chunk
), summaries AS (
  SELECT user_id, chunk, len(vals) AS n_c,
    list_reduce([0.0::DOUBLE] || vals,
      (s, x) -> {_Q136_ALPHA}*x + {1 - _Q136_ALPHA}*s) AS s_c,
    list_reduce([1.0::DOUBLE] || list_transform(vals, x -> {1 - _Q136_ALPHA}::DOUBLE),
      (s, x) -> s * x) AS d_c
  FROM per_chunk
), merged AS (
  SELECT user_id, CAST(SUM(n_c) AS BIGINT) AS n_events, COUNT(*) AS n_chunks,
    list_reduce(
      [{{'s': 0.0::DOUBLE, 'd': 1.0::DOUBLE}}] ||
      list({{'s': s_c, 'd': d_c}} ORDER BY chunk),
      (acc, e) -> {{'s': e.s + e.d * acc.s, 'd': 1.0::DOUBLE}}
    ).s AS ewma_raw
  FROM summaries GROUP BY user_id
)
SELECT user_id, n_events, n_chunks,
  {sql_dround("ewma_raw", 6)} AS ewma
FROM merged
"""


QUERIES.update(
    {
        "q136_ewma_segmented": Query(q136_ewma_segmented, _Q136_SQL),
    }
)


# ---------------------------------------------------------------------------
# q137 — SEGMENTED sessionization (the q34-family mitigation, same idea
# as q136): per (user, calendar chunk) count gap-based sessions and keep
# the chunk's first/last instants; per user, fold the ≤C ordered chunk
# summaries — a session continuing across a chunk boundary (gap ≤ G)
# merges two counts into one. Exact integer algebra, so the DuckDB twin
# runs the PLAIN single-pass lag algorithm — an independent algorithm
# agreeing on every row is a stronger check than a mirrored one.
# ---------------------------------------------------------------------------
_Q137_GAP_US = 30 * 60 * 1_000_000  # q34's 30-minute gap
_Q137_CHUNK_US = 7 * 86_400 * 1_000_000


def q137_sessions_segmented(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        (F.unix_micros("ts") / _Q137_CHUNK_US).cast("bigint").alias("chunk"),
    )
    per_chunk = ev.groupBy("user_id", "chunk").agg(
        F.array_sort(F.collect_list("t")).alias("ts")
    )
    n_c = F.lit(1) + F.aggregate(
        F.zip_with(
            F.slice("ts", 2, F.greatest(F.size("ts") - 1, F.lit(0))),
            F.slice("ts", 1, F.greatest(F.size("ts") - 1, F.lit(0))),
            lambda b, a: (b - a > _Q137_GAP_US).cast("int"),
        ),
        F.lit(0),
        lambda s, x: s + x,
    )
    per_chunk = per_chunk.select(
        "user_id",
        "chunk",
        F.size("ts").alias("n_events"),
        n_c.alias("n_sessions"),
        F.element_at("ts", 1).alias("first_t"),
        F.element_at("ts", -1).alias("last_t"),
    )
    merged = per_chunk.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("chunk", "n_sessions", "first_t", "last_t"))
        ).alias("cs"),
        F.sum("n_events").alias("n_events"),
    )
    # fold: total sessions = Σ n_c − (boundaries whose inter-chunk gap ≤ G)
    acc0 = F.struct(
        F.lit(0).cast("bigint").alias("total"),
        F.lit(None).cast("bigint").alias("last_t"),
    )
    fold = F.aggregate(
        F.col("cs"),
        acc0,
        lambda acc, e: F.struct(
            (
                acc["total"]
                + e["n_sessions"]
                - F.when(
                    acc["last_t"].isNotNull()
                    & (e["first_t"] - acc["last_t"] <= _Q137_GAP_US),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("total"),
            e["last_t"].alias("last_t"),
        ),
    )["total"]
    return merged.select("user_id", "n_events", fold.alias("n_sessions"))


_Q137_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
), flagged AS (
  SELECT user_id, t,
    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
              > {_Q137_GAP_US} OR
              lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM ev
)
SELECT user_id, COUNT(*) AS n_events, CAST(SUM(new_session) AS BIGINT) AS n_sessions
FROM flagged GROUP BY user_id
"""


QUERIES.update(
    {
        "q137_sessions_segmented": Query(q137_sessions_segmented, _Q137_SQL),
    }
)


# ---------------------------------------------------------------------------
# q138 — behavior co-occurrence mining (market-basket over event types):
# for each pair of event types, how many users do both, and the lift
# over independence. The pair space is |types|² (bounded, tiny) — pairs
# come from a self-join of the DISTINCT (user, type) frame, never of raw
# events; supports and lift are exact decimal arithmetic.
# ---------------------------------------------------------------------------
def q138_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    # the distinct (user, type) frame (bounded: users × event types) feeds
    # four consumers (the n_users scalar, both self-join sides, singles) —
    # checkpoint so events is scanned+deduped once, not four times
    ev = (
        table(spark, sf, "events")
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_users = ev.select("user_id").distinct().count()  # bounded scalar
    a = ev.alias("a")
    b = ev.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    singles = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    out = pairs.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
    lift = F.round(
        F.col("n_both").cast("decimal(30,10)") * F.lit(int(n_users))
        / (F.col("n_a") * F.col("n_b")),
        6,
    ).cast("double")
    return out.select("type_a", "type_b", "n_both", "n_a", "n_b", lift.alias("lift"))


_Q138_SQL = """
WITH ev AS (
  SELECT DISTINCT user_id, event_type FROM events
), u AS (
  SELECT COUNT(DISTINCT user_id) AS n_users FROM ev
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM ev a JOIN ev b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
), singles AS (
  SELECT event_type, COUNT(*) AS n FROM ev GROUP BY event_type
)
SELECT type_a, type_b, n_both, sa.n AS n_a, sb.n AS n_b,
  CAST(ROUND(CAST(n_both AS DECIMAL(30,10)) * u.n_users / (sa.n * sb.n), 6) AS DOUBLE)
    AS lift
FROM pairs
JOIN singles sa ON sa.event_type = type_a
JOIN singles sb ON sb.event_type = type_b
CROSS JOIN u
"""


# ---------------------------------------------------------------------------
# q139 — A/B experiment analysis with a DETERMINISTIC assignment: users
# hash into arm A or B (md5 — reproducible, no RNG), and per event type
# the two arms' value distributions are compared with a Welch t
# statistic. Means/variances come from one pass of decimal-exact
# (n, Σx, Σx²) sufficient statistics per (type, arm); the t arithmetic
# is per-row double math on pre-rounded inputs with a final round.
# ---------------------------------------------------------------------------
def q139_ab_test(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select("user_id", "event_type", "value")
    arm = F.when(
        hexint(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))) % 2 == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    stats = (
        ev.withColumn("arm", arm)
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,10)")).alias("sx"),
            F.sum(
                (F.col("value") * F.col("value")).cast("decimal(30,10)")
            ).alias("sxx"),
        )
    )
    # decimal-exact sums → IEEE double arithmetic → decimal round (a
    # decimal÷count division rounds differently in Spark vs DuckDB; the
    # decimal product Σx·Σx also overflows DuckDB's 38-digit width)
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    mean = F.round((sx_d / F.col("n")).cast("decimal(24,10)"), 10).cast("double")
    var = F.round(
        (
            (sxx_d - sx_d * sx_d / F.col("n")) / (F.col("n") - 1)
        ).cast("decimal(24,10)"),
        10,
    ).cast("double")
    stats = stats.select("event_type", "arm", "n", mean.alias("m"), var.alias("v"))
    a = stats.where(F.col("arm") == "A").select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("m").alias("mean_a"),
        F.col("v").alias("var_a"),
    )
    b = stats.where(F.col("arm") == "B").select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("m").alias("mean_b"),
        F.col("v").alias("var_b"),
    )
    j = a.join(b, "event_type")
    t = dround(
        (F.col("mean_a") - F.col("mean_b"))
        / F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")),
        6,
    )
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        dround(F.col("mean_a"), 6).alias("mean_a"),
        dround(F.col("mean_b"), 6).alias("mean_b"),
        t.alias("t_stat"),
        (F.abs(t) > 1.96).alias("significant"),
    )


_Q139_SQL = f"""
WITH armed AS (
  SELECT event_type, value,
    CASE WHEN {_SQL_HEXINT.format(expr="'ab|' || CAST(user_id AS VARCHAR)")} % 2 = 0
         THEN 'A' ELSE 'B' END AS arm
  FROM events
), stats AS (
  SELECT event_type, arm, COUNT(*) AS n,
    CAST(ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*)
      AS DECIMAL(24,10)), 10) AS DOUBLE) AS m,
    CAST(ROUND(CAST(
      (CAST(SUM(CAST(value*value AS DECIMAL(30,10))) AS DOUBLE)
        - CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)
          * CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*))
      / (COUNT(*) - 1) AS DECIMAL(24,10)), 10) AS DOUBLE) AS v
  FROM armed GROUP BY event_type, arm
), j AS (
  SELECT a.event_type,
    a.n AS n_a, b.n AS n_b, a.m AS mean_a, b.m AS mean_b, a.v AS var_a, b.v AS var_b
  FROM stats a JOIN stats b
    ON a.event_type = b.event_type AND a.arm = 'A' AND b.arm = 'B'
)
SELECT event_type, n_a, n_b,
  {sql_dround("mean_a", 6)} AS mean_a,
  {sql_dround("mean_b", 6)} AS mean_b,
  {sql_dround("(mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b)", 6)} AS t_stat,
  abs({sql_dround("(mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b)", 6)}) > 1.96
    AS significant
FROM j
"""


QUERIES.update(
    {
        "q138_cooccurrence": Query(q138_cooccurrence, _Q138_SQL),
        "q139_ab_test": Query(q139_ab_test, _Q139_SQL),
    }
)


# ---------------------------------------------------------------------------
# q140 — multi-touch attribution: every 'purchase' distributes credit
# over the SAME user's preceding touches within a 7-day lookback —
# last-touch (all credit to the latest) and linear (1/n each) models in
# one pass.
#
# NOT a pair join. The r7 64× probe caught the original
# touch⋈conv-on-user_id form super-linear (exponent 1.31, 0.9 s → 212 s:
# pairs grow with touches×convs per user-week — a power user kills it at
# 100 TB). The aggregates only ever need, per conversion, (a) the COUNT
# of in-lookback touches per type and (b) the LATEST touch — both linear:
#   (a) prefix-count difference: running per-(user, type) touch count,
#       read at two synthetic interval-endpoint rows per (conv, type)
#       (conv_t and conv_t − lookback; endpoint rows sort BEFORE touches
#       at an equal timestamp, giving the strict/inclusive bounds of the
#       pair predicate exactly);
#   (b) the latest in-lookback touch rides the SAME stream: a running
#       max(struct(touch_t, touch_id)) per (user, type) read at the conv_t
#       endpoint is the latest type-T touch, and whenever cnt_T > 0 it is
#       necessarily inside the lookback; the conv's overall last touch is
#       the struct-max across its type rows (same (touch_t, touch_id)-desc
#       tie-break as the pair form's row_number).
# Linear credit stays decimal-exact: cnt_T · round(1/n, 10) equals the
# pair form's sum of cnt_T identical addends; the factor is cast to
# decimal(11,10) (1/n ≤ 1, scale-10 exact) so the product never hits the
# 38-digit cap. The conv×touch-type expansion broadcasts a distinct-types
# dim of enum size (column-pruned third scan of events).
# ---------------------------------------------------------------------------
_Q140_LOOKBACK_US = 7 * 86_400 * 1_000_000


def attribution_core(ev: DataFrame, lookback_us: int) -> DataFrame:
    """The q140 prefix-count/running-max attribution plan over an events
    frame with columns (user_id long, event_id long, event_type string,
    t long). Factored out of q140_attribution so scripts/fuzz_parity.py
    (family #6) can sweep it against a pure-Python pair-join replica on
    randomized corpora — the endpoint-ordering trick (sign-sorted
    interval endpoints reproducing the pair predicate's strict/inclusive
    bounds) is exactly the off-by-one surface fuzzing exists for."""
    # null user/ts rows can never produce a pair in the join formulation
    # (null equi-key / null range predicate); drop them upfront so the
    # window formulation matches exactly
    ev = ev.where(F.col("user_id").isNotNull() & F.col("t").isNotNull())
    conv = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), F.col("t").alias("conv_t")
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("touch_id"), F.col("t").alias("touch_t"),
    )

    # --- (a) per-(conv, type) in-lookback counts via prefix differences ---
    types = F.broadcast(touch.select("touch_type").distinct())
    endpoints = conv.crossJoin(types).select(
        "user_id",
        "touch_type",
        "conv_id",
        F.explode(
            F.array(
                F.struct(
                    F.col("conv_t").alias("t"), F.lit(1).cast("long").alias("sign")
                ),
                F.struct(
                    (F.col("conv_t") - lookback_us).alias("t"),
                    F.lit(-1).cast("long").alias("sign"),
                ),
            )
        ).alias("e"),
    ).select("user_id", "touch_type", "conv_id", "e.t", "e.sign")
    counted = touch.select(
        "user_id",
        "touch_type",
        F.lit(None).cast("long").alias("conv_id"),
        F.col("touch_t").alias("t"),
        F.lit(0).cast("long").alias("sign"),
        F.struct("touch_t", "touch_id").alias("tt"),
    ).unionByName(
        endpoints.withColumn(
            "tt", F.lit(None).cast("struct<touch_t:long,touch_id:long>")
        )
    )
    # endpoints (sign ±1) sort before touches (sign 0) at equal t: a touch
    # AT conv_t is excluded (strict <) and a touch AT conv_t − lookback is
    # included (>=) — exactly the pair predicate's bounds
    wcum = (
        Window.partitionBy("user_id", "touch_type")
        .orderBy("t", F.col("sign") == 0)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnts = (
        counted.withColumn(
            "cum", F.sum(F.when(F.col("sign") == 0, 1).otherwise(0)).over(wcum)
        )
        .withColumn("latest", F.max("tt").over(wcum))
        .where(F.col("sign") != 0)
        .groupBy("conv_id", "touch_type")
        .agg(
            F.sum(F.col("sign") * F.col("cum")).alias("cnt"),
            # the conv_t endpoint's running max = latest type-T touch
            # before conv_t; when cnt > 0 it is inside the lookback
            F.max(F.when(F.col("sign") == 1, F.col("latest"))).alias("latest"),
        )
        .where(F.col("cnt") > 0)
    )

    # --- combine: n, per-conv last touch, decimal-exact linear credit -----
    wconv = Window.partitionBy("conv_id")
    enriched = cnts.withColumn("n_touches", F.sum("cnt").over(wconv)).withColumn(
        "conv_last",
        F.max(
            F.struct(
                F.col("latest.touch_t"),
                F.col("latest.touch_id"),
                F.col("touch_type"),
            )
        ).over(wconv),
    )
    linear_unit = F.round(
        F.lit(1).cast("decimal(30,10)") / F.col("n_touches"), 10
    ).cast("decimal(11,10)")
    return (
        enriched.withColumn(
            "linear", F.col("cnt").cast("decimal(10,0)") * linear_unit
        )
        .groupBy("touch_type")
        .agg(
            F.countDistinct("conv_id").alias("n_conversions_touched"),
            F.sum(
                F.when(F.col("conv_last.touch_type") == F.col("touch_type"), 1)
                .otherwise(0)
                .cast("long")
            ).alias("last_touch_credit"),
            F.round(F.sum("linear"), 6).cast("double").alias("linear_credit"),
        )
    )


def q140_attribution(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("t")
    )
    return attribution_core(ev, _Q140_LOOKBACK_US)


_Q140_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
), conv AS (
  SELECT user_id, event_id AS conv_id, t AS conv_t FROM ev
  WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, event_type AS touch_type, event_id AS touch_id, t AS touch_t
  FROM ev WHERE event_type <> 'purchase'
), pairs AS (
  SELECT touch_type, conv_id, touch_t, touch_id,
    COUNT(*) OVER (PARTITION BY conv_id) AS n_touches,
    row_number() OVER (PARTITION BY conv_id ORDER BY touch_t DESC, touch_id DESC)
      AS rk
  FROM touch JOIN conv USING (user_id)
  WHERE touch_t < conv_t AND touch_t >= conv_t - {_Q140_LOOKBACK_US}
)
SELECT touch_type,
  COUNT(DISTINCT conv_id) AS n_conversions_touched,
  CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch_credit,
  CAST(ROUND(SUM(ROUND(CAST(1 AS DECIMAL(30,10)) / n_touches, 10)), 6) AS DOUBLE)
    AS linear_credit
FROM pairs GROUP BY touch_type
"""


QUERIES.update(
    {
        "q140_attribution": Query(q140_attribution, _Q140_SQL),
    }
)


# ---------------------------------------------------------------------------
# q141 — linear-interpolation gap fill (the TS-repair step between q82's
# carry-forward fill and a model): missing hours on the spine get
# prev + (next − prev)·(h − h_prev)/(h_next − h_prev); edges fall back
# to the nearest observation. Two IGNORE NULLS window passes over the
# SPINE (hours, not raw events) — per-row IEEE double arithmetic, engine
# exact; observed averages come decimal-rounded from the aggregate.
# ---------------------------------------------------------------------------
_Q141_HOUR_US = 3_600_000_000


def q141_interpolated_hours(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").where(F.col("event_type") == "purchase")
    bucket = F.expr(f"unix_micros(ts) div {_Q141_HOUR_US} * {_Q141_HOUR_US}")
    agg = ev.groupBy(bucket.alias("hour_us")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            (
                F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            ).cast("decimal(24,10)"),
            6,
        )
        .cast("double")
        .alias("avg_value"),
    )
    spine = agg.agg(F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi")).select(
        F.explode(F.sequence("lo", "hi", F.lit(_Q141_HOUR_US))).alias("hour_us")
    )
    joined = spine.join(agg, "hour_us", "left")
    w_back = Window.orderBy("hour_us").rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.orderBy("hour_us").rowsBetween(0, Window.unboundedFollowing)
    obs_h = F.when(F.col("avg_value").isNotNull(), F.col("hour_us"))
    joined = joined.select(
        "hour_us",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(w_back).alias("ph"),
        F.first("avg_value", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(w_fwd).alias("nh"),
    )
    frac = (F.col("hour_us") - F.col("ph")).cast("double") / (
        F.col("nh") - F.col("ph")
    ).cast("double")
    interp = F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).otherwise(
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        ).otherwise(F.coalesce("pv", "nv"))
    )
    return joined.select(
        "hour_us",
        "n_events",
        (F.col("avg_value").isNull()).alias("interpolated"),
        dround(interp, 6).alias("value_filled"),
    )


_Q141_SQL = f"""
WITH agg AS (
  SELECT (epoch_us(ts) // {_Q141_HOUR_US}) * {_Q141_HOUR_US} AS hour_us,
         COUNT(*) AS n_events,
         CAST(ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
           AS DECIMAL(24,10)), 6) AS DOUBLE) AS avg_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), spine AS (
  SELECT unnest(range((SELECT MIN(hour_us) FROM agg),
                      (SELECT MAX(hour_us) FROM agg) + 1,
                      {_Q141_HOUR_US})) AS hour_us
), joined AS (
  SELECT s.hour_us, COALESCE(a.n_events, 0) AS n_events, a.avg_value,
    last_value(a.avg_value IGNORE NULLS) OVER
      (ORDER BY s.hour_us ROWS UNBOUNDED PRECEDING) AS pv,
    last_value(CASE WHEN a.avg_value IS NOT NULL THEN s.hour_us END IGNORE NULLS)
      OVER (ORDER BY s.hour_us ROWS UNBOUNDED PRECEDING) AS ph,
    first_value(a.avg_value IGNORE NULLS) OVER
      (ORDER BY s.hour_us ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN a.avg_value IS NOT NULL THEN s.hour_us END IGNORE NULLS)
      OVER (ORDER BY s.hour_us ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      AS nh
  FROM spine s LEFT JOIN agg a ON s.hour_us = a.hour_us
)
SELECT hour_us, n_events,
  avg_value IS NULL AS interpolated,
  {sql_dround('''CASE WHEN avg_value IS NOT NULL THEN avg_value
       WHEN pv IS NOT NULL AND nv IS NOT NULL
       THEN pv + (nv - pv) * (CAST(hour_us - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
       ELSE COALESCE(pv, nv) END''', 6)} AS value_filled
FROM joined
"""


QUERIES.update(
    {
        "q141_interpolated_hours": Query(q141_interpolated_hours, _Q141_SQL),
    }
)


# ---------------------------------------------------------------------------
# q142 — reciprocal-rank fusion (RRF, Cormack et al.): combine the exact
# cosine ranking (q26) with the LSH-bucketed ANN ranking (q32) into one
# list — the standard ensemble step of a retrieval stack (dense + approx,
# or dense + BM25). Fused score = Σ 1/(60 + rank) over the lists that
# returned the candidate, as exact decimals; a full-outer join on
# (query, neighbor) aligns the two bounded result lists (k·|queries|
# rows — the fusion cost is independent of corpus size).
# ---------------------------------------------------------------------------
_RRF_K = 60
_RRF_TOP = 3


def q142_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.queries.lifedata import (
        q26_ann_cosine_topk,
        q32_ann_lsh_bucketed,
    )
    from job_etl_spark.tables import parallel_table

    contrib = lambda rn: F.round(  # noqa: E731
        F.lit(1).cast("decimal(20,12)") / (F.lit(_RRF_K) + rn), 12
    )
    # ONE embeddings scan shared by both retrieval arms (r11, guide §2.4):
    # composed standalone, q26 + q32 each scanned embeddings twice (corpus +
    # query set) — 4 scans of the corpus for one fusion. The checkpointed
    # (vec_id, vec) frame feeds all four consumers; each arm's internal
    # algebra (and the fused result) is unchanged.
    emb = parallel_table(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    ).localCheckpoint(eager=False)
    r1 = q26_ann_cosine_topk(spark, sf, emb=emb).select(
        "q_id", "neighbor_id", contrib(F.col("rn")).alias("s1")
    )
    r2 = q32_ann_lsh_bucketed(spark, sf, emb=emb).select(
        "q_id", "neighbor_id", contrib(F.col("rn")).alias("s2")
    )
    fused = r1.join(r2, ["q_id", "neighbor_id"], "full_outer").select(
        "q_id",
        "neighbor_id",
        (
            F.coalesce("s1", F.lit(0).cast("decimal(20,12)"))
            + F.coalesce("s2", F.lit(0).cast("decimal(20,12)"))
        ).alias("rrf"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        fused.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= _RRF_TOP)
        .select(
            "q_id",
            "rn",
            "neighbor_id",
            # exact 1e-12 units: decimal→double conversion differs by 1 ulp
            # between engines, so the score ships as an exact integer
            (F.col("rrf") * F.lit(10**12)).cast("bigint").alias("rrf_score_e12"),
        )
    )


def _q142_sql() -> str:
    from job_etl_spark.queries.lifedata import QUERIES as _LQ

    q26_sql = _LQ["q26_ann_cosine_topk"].oracle
    q32_sql = _LQ["q32_ann_lsh_bucketed"].oracle
    c = f"ROUND(CAST(1 AS DECIMAL(20,12)) / ({_RRF_K} + rn), 12)"
    return f"""
WITH r1 AS (
  SELECT q_id, neighbor_id, {c} AS s1 FROM ({q26_sql})
), r2 AS (
  SELECT q_id, neighbor_id, {c} AS s2 FROM ({q32_sql})
), fused AS (
  SELECT COALESCE(r1.q_id, r2.q_id) AS q_id,
    COALESCE(r1.neighbor_id, r2.neighbor_id) AS neighbor_id,
    COALESCE(s1, 0) + COALESCE(s2, 0) AS rrf
  FROM r1 FULL OUTER JOIN r2
    ON r1.q_id = r2.q_id AND r1.neighbor_id = r2.neighbor_id
), ranked AS (
  SELECT q_id, neighbor_id, rrf,
    CAST(row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, neighbor_id ASC)
      AS INT) AS rn
  FROM fused
)
SELECT q_id, rn, neighbor_id,
  CAST(rrf * 1000000000000 AS BIGINT) AS rrf_score_e12
FROM ranked WHERE rn <= {_RRF_TOP}
"""


QUERIES.update(
    {
        "q142_rrf_fusion": Query(q142_rrf_fusion, _q142_sql()),
    }
)


# ---------------------------------------------------------------------------
# q143 — near-dup graph degree distribution (the corpus-clustering
# diagnostic a curation run reads before choosing a dedup policy: a few
# giant hubs ⇒ boilerplate/templates; uniform low degree ⇒ organic
# near-dups). Composes q31's blocked simhash pairs; every doc (including
# isolated ones) lands in a degree bucket. Pair volume is band-bounded
# (q31), the rest is two hash aggs.
# ---------------------------------------------------------------------------
def q143_neardup_degree(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.queries.lifedata import q31_simhash_neardup

    # the unionAll consumes pairs twice — checkpoint (near-dup pairs are a
    # tiny fraction of the corpus) so the whole simhash pipeline runs
    # once, not once per endpoint column
    pairs = q31_simhash_neardup(spark, sf).localCheckpoint(eager=False)
    ends = pairs.select(F.col("doc_a").alias("doc_id")).unionAll(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    docs = table(spark, sf, "documents").select("doc_id")
    all_deg = docs.join(deg, "doc_id", "left").select(
        F.coalesce("degree", F.lit(0).cast("bigint")).alias("degree")
    )
    return all_deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_docs"))


def _q143_sql() -> str:
    from job_etl_spark.queries.lifedata import QUERIES as _LQ

    q31_sql = _LQ["q31_simhash_neardup"].oracle
    return f"""
WITH pairs AS (
  SELECT doc_a, doc_b FROM ({q31_sql})
), ends AS (
  SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs
), deg AS (
  SELECT doc_id, COUNT(*) AS degree FROM ends GROUP BY doc_id
)
SELECT COALESCE(deg.degree, 0) AS degree, COUNT(*) AS n_docs
FROM documents d LEFT JOIN deg ON d.doc_id = deg.doc_id
GROUP BY 1
"""


QUERIES.update(
    {
        "q143_neardup_degree": Query(q143_neardup_degree, _q143_sql()),
    }
)


# ---------------------------------------------------------------------------
# q144 — BM25 ranked retrieval (Robertson/Spärck Jones): the lexical
# scorer beside the ANN stack (q26/q32/q114) and under the RRF ensemble
# (q142). One token explode filtered to the query's terms (the inverted-
# index access pattern — at scale this is a q98 posting-list lookup, not
# a corpus scan), then per-(doc, term) tf joins the tiny per-term df
# frame and the global avgdl. ln() applies to a pre-rounded rational and
# the per-term score is rounded at 8 before the exact decimal sum —
# engine libm variance absorbed (the q117 discipline).
# ---------------------------------------------------------------------------
_Q144_TERMS = ["table", "query", "spark"]
_Q144_K1 = 1.2
_Q144_B = 0.75
_Q144_TOP = 20


def q144_bm25(spark: SparkSession, sf: str) -> DataFrame:
    docs = parallel_table(spark, sf, "documents").where(F.col("text").isNotNull())
    # checkpoint: the token frame feeds both the length stats and the term
    # stream — one corpus scan+tokenize, not one per branch
    toks = docs.select("doc_id", tokens_expr("text").alias("toks")).localCheckpoint(
        eager=False
    )
    lens = toks.select("doc_id", F.size("toks").alias("dl"))
    # corpus stats (N, avgdl) ride the plan as ONE broadcast 1-row frame
    # instead of two driver-collected scalar jobs — identical values, two
    # fewer corpus passes (the oracle recomputes both in SQL)
    stats = lens.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            (
                F.sum(F.col("dl").cast("decimal(30,8)")).cast("double")
                / F.count(F.lit(1))
            ).cast("decimal(24,10)"),
            8,
        )
        .cast("double")
        .alias("a"),
    )
    terms = toks.select(
        "doc_id", F.explode("toks").alias("term")
    ).where(F.col("term").isin(_Q144_TERMS))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).crossJoin(
        F.broadcast(stats)
    )
    # idf = ln(1 + (N − df + 0.5)/(df + 0.5)) on a pre-rounded ratio
    ratio = F.round(
        (F.col("n") - F.col("df") + F.lit(0.5)).cast("decimal(30,12)")
        / (F.col("df") + F.lit(0.5)),
        12,
    ).cast("double")
    idf = dround(F.log(F.lit(1.0) + ratio), 8)
    df_ = df_.select("term", idf.alias("idf"), "a")
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(lens, "doc_id")
        .withColumn(
            "term_score",
            dround(
                F.col("idf")
                * (F.col("tf") * (_Q144_K1 + 1))
                / (
                    F.col("tf")
                    + _Q144_K1
                    * (1 - _Q144_B + _Q144_B * F.col("dl") / F.col("a"))
                ),
                8,
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum(F.col("term_score").cast("decimal(30,8)")), 6)
        .cast("double")
        .alias("bm25"),
    )
    # Top-K via orderBy+limit (TakeOrderedAndProject) so the unpartitioned
    # rank window only ever sees _Q144_TOP rows.
    top = per_doc.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_Q144_TOP)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return top.withColumn("rn", F.row_number().over(w).cast("int")).select(
        "rn", "doc_id", "n_terms_hit", "bm25"
    )


def _q144_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _Q144_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), lens AS (
  SELECT doc_id, len(toks) AS dl FROM toks
), g AS (
  SELECT COUNT(*) AS n_docs,
    CAST(ROUND(CAST(CAST(SUM(CAST(dl AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*)
      AS DECIMAL(24,10)), 8) AS DOUBLE) AS avgdl
  FROM lens
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest(toks) AS term FROM toks
  ) WHERE term IN ({terms}) GROUP BY 1, 2
), idf AS (
  SELECT term,
    {sql_dround('''ln(1.0 + CAST(ROUND(
      CAST(g.n_docs - df + 0.5 AS DECIMAL(30,12)) / (df + 0.5), 12) AS DOUBLE))''', 8)}
      AS idf
  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term) CROSS JOIN g
), scored AS (
  SELECT tf.doc_id,
    {sql_dround(f'''idf.idf * (tf.tf * ({_Q144_K1} + 1))
      / (tf.tf + {_Q144_K1} * (1 - {_Q144_B} + {_Q144_B} * lens.dl / g.avgdl))''', 8)}
      AS term_score
  FROM tf JOIN idf USING (term) JOIN lens USING (doc_id) CROSS JOIN g
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_terms_hit,
    CAST(ROUND(SUM(CAST(term_score AS DECIMAL(30,8))), 6) AS DOUBLE) AS bm25
  FROM scored GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rn,
  doc_id, n_terms_hit, bm25
FROM per_doc
QUALIFY rn <= {_Q144_TOP}
"""


QUERIES.update(
    {
        "q144_bm25": Query(q144_bm25, _q144_sql()),
    }
)


# ---------------------------------------------------------------------------
# q145 — snippet extraction (the result-rendering step after q144's
# scoring): per matching doc, the 10-token window with the highest query-
# term density (ties → earliest), returned as text. Entirely map-side
# array arithmetic over each doc's term-hit positions — no joins, no
# shuffle beyond the global top-20 rank.
# ---------------------------------------------------------------------------
_Q145_WIN = 10
_Q145_TOP = 20


def q145_snippets(spark: SparkSession, sf: str) -> DataFrame:
    docs = parallel_table(spark, sf, "documents").where(F.col("text").isNotNull())
    toks = tokens_expr("text")
    # Hit positions via posexplode + a filter ON THE GENERATED COLUMN.
    # The previous array-expression form (`where(size(hits) > 0)`) let
    # Catalyst push the hits filter below the parallelizing exchange,
    # re-running the whole tokenize pipeline single-task inside the scan
    # stage; a predicate on a Generate output cannot sink below it, so the
    # heavy per-token work stays in the post-exchange parallel stage.
    hits_df = (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.posexplode("toks").alias("p", "t"))
        .where(F.col("t").isin(_Q144_TERMS))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.col("p") + 1)).alias("hits"))
    )
    best = F.array_max(
        F.transform(
            F.col("hits"),
            lambda p: F.struct(
                F.size(
                    F.filter(
                        F.col("hits"), lambda q: (q >= p) & (q <= p + _Q145_WIN - 1)
                    )
                ).alias("density"),
                (-p).alias("np"),
            ),
        )
    )
    scored = hits_df.select(
        "doc_id",
        best.getField("density").alias("density"),
        (-best.getField("np")).cast("bigint").alias("best_pos"),
    )
    # Distributed top-K (TakeOrderedAndProject) first; snippets are then
    # rendered for ONLY the winning docs by broadcasting the 20-row result
    # back against the corpus — tokenization runs twice over hit docs but
    # only the winners' text is sliced.
    top = scored.orderBy(F.desc("density"), F.asc("doc_id")).limit(_Q145_TOP)
    joined = docs.select("doc_id", "text").join(F.broadcast(top), "doc_id")
    out = joined.select(
        "doc_id",
        "density",
        "best_pos",
        F.concat_ws(
            " ", F.slice(toks, F.col("best_pos").cast("int"), _Q145_WIN)
        ).alias("snippet"),
    )
    w = Window.orderBy(F.desc("density"), F.asc("doc_id"))
    return out.withColumn("rn", F.row_number().over(w).cast("int")).select(
        "rn", "doc_id", "density", "best_pos", "snippet"
    )


def _q145_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _Q144_TERMS)
    return f"""
WITH d AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), h AS (
  SELECT doc_id, toks,
    list_filter(range(1, len(toks) + 1), i -> toks[i] IN ({terms})) AS hits
  FROM d
), b AS (
  SELECT doc_id, toks,
    list_max(list_transform(hits, p -> {{
      'density': len(list_filter(hits, q -> q >= p AND q <= p + {_Q145_WIN - 1})),
      'np': -p}})) AS best
  FROM h WHERE len(hits) > 0
), s AS (
  SELECT doc_id, best.density AS density,
    CAST(-best.np AS BIGINT) AS best_pos,
    array_to_string(toks[-best.np : -best.np + {_Q145_WIN - 1}], ' ') AS snippet
  FROM b
)
SELECT CAST(row_number() OVER (ORDER BY density DESC, doc_id ASC) AS INT) AS rn,
  doc_id, density, best_pos, snippet
FROM s QUALIFY rn <= {_Q145_TOP}
"""


# ---------------------------------------------------------------------------
# q146 — score calibration curve (model-eval for the quality filters):
# decile the corpus by the CHEAP screening score (q129's ttr×length) and
# report the mean of an independent "gold" signal (1 − top-token share,
# a repetition-based quality proxy) per decile — the monotonicity check
# that tells a curator whether the cheap score ranks like the expensive
# one. One pass computes both scores map-side; ntile + one agg.
# ---------------------------------------------------------------------------
def q146_calibration(spark: SparkSession, sf: str) -> DataFrame:
    docs = parallel_table(spark, sf, "documents").where(F.col("text").isNotNull())
    toks = tokens_expr("text")
    d = docs.select("doc_id", "n_chars", toks.alias("toks"))
    n_tok = F.size("toks")
    ttr = F.size(F.array_distinct("toks")).cast("decimal(30,8)") / n_tok
    len_score = F.least(F.lit(1.0), F.col("n_chars") / F.lit(500.0)).cast(
        "decimal(30,8)"
    )
    pred = F.round(ttr * len_score, 6).cast("double")
    top_share = (
        F.array_max(
            F.transform(
                F.array_distinct("toks"),
                lambda t: F.size(F.filter("toks", lambda x: x == t)),
            )
        ).cast("decimal(30,8)")
        / n_tok
    )
    gold = F.round(F.lit(1).cast("decimal(30,8)") - top_share, 6).cast("double")
    from job_etl_spark.operators.ranks import global_ntile

    scored = d.select("doc_id", pred.alias("pred"), gold.alias("gold"))
    # exact decile via range-partitioned ranks (operators/ranks.py) — no
    # single-task global window
    deciled = global_ntile(scored, ["pred", "doc_id"], 10, "decile")
    return deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            (
                F.sum(F.col("pred").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            ).cast("decimal(24,10)"),
            6,
        )
        .cast("double")
        .alias("avg_pred"),
        F.round(
            (
                F.sum(F.col("gold").cast("decimal(30,6)")).cast("double")
                / F.count(F.lit(1))
            ).cast("decimal(24,10)"),
            6,
        )
        .cast("double")
        .alias("avg_gold"),
    )


_Q146_SQL = """
WITH d AS (
  SELECT doc_id, n_chars,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), scored AS (
  SELECT doc_id,
    CAST(ROUND(CAST(len(list_distinct(toks)) AS DECIMAL(30,8)) / len(toks)
      * CAST(least(1.0, n_chars / 500.0) AS DECIMAL(30,8)), 6) AS DOUBLE) AS pred,
    CAST(ROUND(CAST(1 AS DECIMAL(30,8))
      - CAST(list_max(list_transform(list_distinct(toks),
          t -> len(list_filter(toks, x -> x = t)))) AS DECIMAL(30,8)) / len(toks),
      6) AS DOUBLE) AS gold
  FROM d
), deciled AS (
  SELECT *, ntile(10) OVER (ORDER BY pred, doc_id) AS decile FROM scored
)
SELECT decile, COUNT(*) AS n_docs,
  CAST(ROUND(CAST(CAST(SUM(CAST(pred AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
    AS DECIMAL(24,10)), 6) AS DOUBLE) AS avg_pred,
  CAST(ROUND(CAST(CAST(SUM(CAST(gold AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
    AS DECIMAL(24,10)), 6) AS DOUBLE) AS avg_gold
FROM deciled GROUP BY decile
"""


QUERIES.update(
    {
        "q145_snippets": Query(q145_snippets, _q145_sql()),
        "q146_calibration": Query(q146_calibration, _Q146_SQL),
    }
)
