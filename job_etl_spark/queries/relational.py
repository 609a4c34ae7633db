"""Relational operator coverage (SURVEY.md §2.1-2.7) over the driver tables.

Each query is the Spark-first expression of a reference operator family,
with scale notes inline: broadcasts are explicit, top-k is
TakeOrderedAndProject, aggregations are partial+final hash aggs, and no
query materializes unbounded data on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from job_etl_spark.operators import distinct_on, merge_upsert, top_k
from job_etl_spark.operators.watermark import high_watermark
from job_etl_spark.queries._util import (
    DEC,
    Query,
    davg,
    dround,
    dsum,
    sql_davg,
    sql_dround,
    sql_dsum,
)
from job_etl_spark.tables import parallel_table, table


# ---------------------------------------------------------------------------
# q01 — pricing summary (A1/P5: grouped agg + FILTER-style conditional count)
# ---------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    # parallel_table: the sf0.1 lineitem file is ONE parquet row group, so
    # the seven wide-decimal aggregates (BigDecimal buffers — precision
    # > 18) ran in a single scan task (~2 s); the round-robin fan-out is a
    # no-op at scale where the table has ≥ cores splits (guide §2.5
    # "input skew: one huge unsplittable file")
    li = parallel_table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
            # COUNT(*) FILTER (WHERE ...) — reference P5
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("high_disc_count"),
        )
    )


_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice*(1-l_discount)')} AS sum_disc_price,
  {sql_dsum('l_extendedprice*(1-l_discount)*(1+l_tax)')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order,
  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS high_disc_count
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — regional revenue (J1: star join with broadcast dims)
# ---------------------------------------------------------------------------
def q02_regional_revenue(spark: SparkSession, sf: str) -> DataFrame:
    # parallel_table for the fact side: with the dims broadcast, the join
    # + per-order decimal partial agg otherwise all run inside the
    # single-split scan task (q01's note; no-op at scale)
    li = parallel_table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    nation = table(spark, sf, "nation")
    region = table(spark, sf, "region")
    # dims are tiny → broadcast; only lineitem⋈orders shuffles (AQE may
    # broadcast orders too at small SF)
    geo = F.broadcast(
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
    ).select("c_custkey", "n_name", "r_name")
    # two-level aggregation instead of groupBy + 2×countDistinct: the
    # single-pass form EXPANDs every joined row ×3 (one replica per
    # distinct-agg) before the shuffle; pre-aggregating per (region,
    # nation, order) shuffles each row once with map-side combine, makes
    # n_orders a plain count (an order has exactly one nation), and keeps
    # the decimal sum exact under re-aggregation (decimal + is associative)
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(geo, orders.o_custkey == geo.c_custkey)
        .groupBy("r_name", "n_name", "o_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
            ).alias("_rev")
        )
    )
    return per_order.groupBy("r_name").agg(
        F.round(F.sum("_rev"), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("n_name").alias("n_nations"),
    )


_Q02_SQL = f"""
SELECT r_name,
  {sql_dsum('l_extendedprice*(1-l_discount)')} AS revenue,
  COUNT(DISTINCT o_orderkey) AS n_orders,
  COUNT(DISTINCT n_name) AS n_nations
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# q03 — top-k revenue orders (O1: TakeOrderedAndProject; J1 join)
# ---------------------------------------------------------------------------
def q03_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    building = F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")).select("c_custkey")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(building, orders.o_custkey == building.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return top_k(rev, [F.desc("revenue"), F.asc("o_orderkey")], 10)


_Q03_SQL = f"""
SELECT o_orderkey, o_orderdate,
  {sql_dsum('l_extendedprice*(1-l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q04 — per-source stats (A2-shape: global + per-group with min/max ts)
# ---------------------------------------------------------------------------
def q04_priority_stats(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            davg(F.col("o_totalprice")).alias("avg_price"),
        )
    )


_Q04_SQL = f"""
SELECT o_orderpriority,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  MIN(o_orderdate) AS first_order,
  MAX(o_orderdate) AS last_order,
  {sql_davg('o_totalprice')} AS avg_price
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q05 — DISTINCT ON keep-first (A4: window dedup)
# ---------------------------------------------------------------------------
def q05_first_order_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    first = distinct_on(
        orders, ["o_custkey"], [F.asc("o_orderdate"), F.asc("o_orderkey")]
    )
    return first.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").alias("first_orderdate"),
        F.col("o_totalprice").alias("first_totalprice"),
    )


_Q05_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS first_orderkey,
       o_orderdate AS first_orderdate, o_totalprice AS first_totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q06 — anti join (J4: insert-if-absent / NOT EXISTS)
# ---------------------------------------------------------------------------
def q06_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    return (
        cust.join(orders.select("o_custkey").distinct(),
                  cust.c_custkey == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_Q06_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# q07 — semi join + grouped count
# ---------------------------------------------------------------------------
def q07_active_customers_by_segment(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    orders = table(spark, sf, "orders")
    active = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    return active.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_active"))


_Q07_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_active
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q08 — COALESCE-merge upsert (J3: the reference's workhorse write pattern)
# ---------------------------------------------------------------------------
def q08_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    base = docs.where(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        (F.col("doc_id") * 10).alias("first_seen"),
        (F.col("doc_id") * 10).alias("last_seen"),
    )
    updates = docs.where(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.upper("lang")).alias("lang"),
        F.concat(F.lit("new_"), F.col("source")).alias("source"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("n_chars") + 1).alias("n_chars"),
        (F.col("doc_id") * 10 + 1).alias("first_seen"),
        (F.col("doc_id") * 10 + 1).alias("last_seen"),
    )
    return merge_upsert(
        base,
        updates,
        keys=["doc_id"],
        overwrite_cols=["source", "last_seen"],
        coalesce_cols=["lang", "n_chars"],
        keep_first_cols=["first_seen"],
    )


_Q08_SQL = """
WITH base AS (
  SELECT doc_id, lang, source, n_chars,
         doc_id*10 AS first_seen, doc_id*10 AS last_seen
  FROM documents WHERE doc_id % 3 <> 0
), updates AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN NULL ELSE upper(lang) END AS lang,
         'new_' || source AS source,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars + 1 END AS n_chars,
         doc_id*10 + 1 AS first_seen, doc_id*10 + 1 AS last_seen
  FROM documents WHERE doc_id % 2 = 0
)
SELECT
  COALESCE(u.doc_id, b.doc_id) AS doc_id,
  COALESCE(u.lang, b.lang) AS lang,
  CASE WHEN u.doc_id IS NOT NULL AND b.doc_id IS NOT NULL THEN u.source
       ELSE COALESCE(u.source, b.source) END AS source,
  COALESCE(u.n_chars, b.n_chars) AS n_chars,
  COALESCE(b.first_seen, u.first_seen) AS first_seen,
  CASE WHEN u.doc_id IS NOT NULL AND b.doc_id IS NOT NULL THEN u.last_seen
       ELSE COALESCE(u.last_seen, b.last_seen) END AS last_seen
FROM base b FULL OUTER JOIN updates u ON b.doc_id = u.doc_id
"""


# ---------------------------------------------------------------------------
# q09 — high-watermark incremental scan (A5/P4)
# ---------------------------------------------------------------------------
def q09_watermark_incremental(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.tables import ts_strictly_after

    ev = table(spark, sf, "events")
    wm = high_watermark(ev, "ts")  # scalar agg → literal (reference A5)
    import datetime as dt

    cutoff = wm - dt.timedelta(days=7)
    # predicate on the raw scan column → reaches the parquet scan
    # (PushedFilters); exact µs-domain equivalence of ts > cutoff
    return (
        ev.where(ts_strictly_after(ev, cutoff))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_Q09_SQL = f"""
SELECT event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS total_value,
  COUNT(DISTINCT user_id) AS n_users
FROM events
WHERE ts > (SELECT max(ts) - INTERVAL 7 DAY FROM events)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q10 — union of sources (§2.7 unionByName) + dedup distinct
# ---------------------------------------------------------------------------
def q10_union_sources(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    clicks = ev.where(F.col("event_type").isin("click", "view")).select("user_id", "event_type")
    rest = ev.where(~F.col("event_type").isin("click", "view")).select("user_id", "event_type")
    return (
        clicks.unionByName(rest)
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_distinct_users"))
    )


_Q10_SQL = """
SELECT event_type, COUNT(*) AS n_distinct_users FROM (
  SELECT DISTINCT user_id, event_type FROM (
    SELECT user_id, event_type FROM events WHERE event_type IN ('click','view')
    UNION ALL
    SELECT user_id, event_type FROM events WHERE event_type NOT IN ('click','view')
  )
) GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q11 — running window aggregate (§2.5; exact decimal running sum)
# ---------------------------------------------------------------------------
def q11_running_user_totals(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = (
        F.sum(F.col("value").cast("decimal(30,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    prev = F.lag("value").over(w)
    return ev.where(F.col("user_id") < 50).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.round(run, 2).cast("double").alias("running_value"),
        F.col("value").alias("value"),
        prev.alias("prev_value"),
    )


_Q11_SQL = """
SELECT user_id, epoch_us(ts) AS ts_us, event_id,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))) OVER w, 2) AS DOUBLE) AS running_value,
  value,
  lag(value) OVER w AS prev_value
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# q12 — top-k per group (J7's argmax shape: row_number ≤ k)
# ---------------------------------------------------------------------------
def q12_topk_per_type(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("event_type", "rn", "event_id", "user_id", "value")
    )


_Q12_SQL = """
SELECT event_type, rn, event_id, user_id, value FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# q13 — JSON payload extraction (U3/S5 shape: raw JSON → typed columns)
# ---------------------------------------------------------------------------
def q13_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k_val", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k_val").alias("sum_k"),
            F.count(F.when(F.col("k_val") > 50, 1)).alias("n_high"),
            F.min("k_val").alias("min_k"),
            F.max("k_val").alias("max_k"),
        )
    )


_Q13_SQL = """
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
  COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50 THEN 1 END) AS n_high,
  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q33 — recency scan (O2/S5: ORDER BY ts DESC LIMIT n with total order)
# ---------------------------------------------------------------------------
def q33_recent_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    return top_k(
        ev.select(
            "event_id", F.unix_micros("ts").alias("ts_us"), "user_id", "event_type"
        ),
        [F.desc("ts_us"), F.desc("event_id")],
        100,
    )


_Q33_SQL = """
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
FROM events
ORDER BY ts_us DESC, event_id DESC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q34 — gap-based sessionization (stateful operator, batch form: lag →
# gap flag → running session counter; streaming twin = session_window)
# ---------------------------------------------------------------------------
def q34_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    gap = F.when(
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("new_sess", gap)
        .withColumn("session_id", F.sum("new_sess").over(wrun))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
            dsum(F.col("value")).alias("session_value"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )


_Q34_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
  COUNT(*) AS n_events,
  MIN(epoch_us(ts)) AS start_us,
  MAX(epoch_us(ts)) AS end_us,
  {sql_dsum('value')} AS session_value,
  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us
FROM sess GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# q36 — hourly continuous-aggregate rollup (hypertable idiom): built
# incrementally from two halves and combined — the query output IS the
# incrementally-refreshed table, proving rollup(a∪b) == combine(r(a), r(b))
# ---------------------------------------------------------------------------
def q36_hourly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.operators.rollup import combine_rollups, finalize_rollup, hourly_rollup

    ev = table(spark, sf, "events")
    old = hourly_rollup(ev.where(F.col("event_id") % 2 == 0))
    delta = hourly_rollup(ev.where(F.col("event_id") % 2 == 1))
    return finalize_rollup(combine_rollups(old, delta))


_Q36_SQL = f"""
SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS total_value,
  {sql_davg('value')} AS avg_value,
  MIN(event_id) AS first_event_id,
  MAX(event_id) AS last_event_id
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q37 — as-of join: each purchase matched to the user's latest click at or
# before it (union-tag composition vs DuckDB's native ASOF JOIN oracle).
# Emits the matched click's timestamp (not id) so equal-ts ties are
# unambiguous across engines.
# ---------------------------------------------------------------------------
def q37_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.operators.asof import asof_join

    ev = table(spark, sf, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts_us"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("ts_us").alias("click_ts_us")
    )
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts_us", right_ts="ts_us",
        value_cols=["click_ts_us"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "ts_us",
        "click_ts_us",
        (F.col("ts_us") - F.col("click_ts_us")).alias("gap_us"),
    )


_Q37_SQL = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS click_ts_us FROM events WHERE event_type = 'click'
)
SELECT p.purchase_id, p.user_id, p.ts_us, c.click_ts_us,
       p.ts_us - c.click_ts_us AS gap_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts_us >= c.click_ts_us
"""


# ---------------------------------------------------------------------------
# q38 — TPC-H Q17 shape: correlated scalar subquery ("below half the
# part's average quantity"), decorrelated Spark-first as a single window
# pass instead of agg + self-join. Because the brand filter already
# restricts to whole parts, avg-per-part over the filtered rows equals the
# correlated subquery over all rows — one shuffle total, and the broadcast
# part filter prunes lineitem before any aggregation.
# (l_quantity is whole-numbered, so double avg is order-independent.)
# ---------------------------------------------------------------------------
def q38_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    brand_parts = F.broadcast(
        part.where(F.col("p_brand") == "Brand#4").select("p_partkey", "p_brand")
    )
    filtered = li.join(brand_parts, li.l_partkey == brand_parts.p_partkey)
    w = Window.partitionBy("l_partkey")
    small = filtered.withColumn("part_avg_qty", F.avg("l_quantity").over(w)).where(
        F.col("l_quantity") < 0.5 * F.col("part_avg_qty")
    )
    return small.groupBy("p_brand").agg(
        F.round(F.sum(F.col("l_extendedprice").cast(DEC)) / 7, 2)
        .cast("double")
        .alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small_lines"),
    )


_Q38_SQL = """
SELECT p_brand,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) / 7, 2) AS DOUBLE) AS avg_yearly,
  COUNT(*) AS n_small_lines
FROM lineitem l
JOIN part p ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# q39 — TPC-H Q18 shape: large-volume orders (IN-subquery with HAVING),
# decorrelated as aggregate-then-join. The lineitem agg runs first with
# map-side partial aggregation; the tiny surviving key set (≈1% of orders)
# then drives broadcast joins against orders and customer, so the big
# side shuffles exactly once, on l_orderkey.
# ---------------------------------------------------------------------------
def q39_large_volume_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        # no broadcast hint on big: a FIXED fraction of all orders clears
        # the quantity threshold, so the frame is fact-sized at scale —
        # AQE broadcasts it only when its runtime size actually allows
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


_Q39_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# q40 — TPC-H Q20 shape: nested EXISTS chain (suppliers who shipped > 50
# units of any 'red…' part in 1995), flattened to agg → left-semi joins.
# The part predicate broadcasts into the lineitem scan (partition-pruned,
# pushed shipdate range), the HAVING agg shrinks to a handful of supplier
# keys, and the final semi-join against supplier is a broadcast.
# ---------------------------------------------------------------------------
def q40_red_part_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    red = F.broadcast(part.where(F.col("p_name").like("red%")).select("p_partkey"))
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
        )
        .join(red, li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(shipped), supp.s_suppkey == shipped.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


_Q40_SQL = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 50
)
"""


# ---------------------------------------------------------------------------
# q41 — ROLLUP hierarchy totals (A1 family at scale: one shuffle computes
# every level of the (returnflag, linestatus) hierarchy via partial aggs —
# the Spark-first replacement for N separate GROUP BYs; GROUPING() flags
# disambiguate real NULLs from subtotal rows).
# ---------------------------------------------------------------------------
def q41_rollup_hierarchy(spark: SparkSession, sf: str) -> DataFrame:
    # parallel_table: rollup expands every row ×3 into wide-decimal
    # buffers — single-task on the one-split file otherwise (q01's note)
    li = parallel_table(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


_Q41_SQL = f"""
SELECT l_returnflag, l_linestatus,
  COUNT(*) AS n_lines,
  {sql_dsum('l_extendedprice')} AS sum_price,
  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# q42 — pivot (wide conditional aggregation): one pass over the fact,
# map-side partial aggs, no per-pivot-value rescans. Explicit pivot value
# list keeps the plan static (no extra distinct-values job at scale).
# ---------------------------------------------------------------------------
def q42_pivot_status(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum(F.col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


_Q42_SQL = f"""
SELECT l_returnflag,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,6))) FILTER (WHERE l_linestatus = 'F'), 2) AS DOUBLE) AS qty_f,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,6))) FILTER (WHERE l_linestatus = 'O'), 2) AS DOUBLE) AS qty_o
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q43 — exact per-group percentiles (order statistics): Spark's native
# `percentile` (exact, linear interpolation — same definition as DuckDB
# quantile_cont). l_quantity is whole-numbered so the interpolation
# arithmetic is IEEE-identical across engines. At 100 TB the swap-in is
# approx_percentile (t-digest, mergeable) — the exact form shown here is
# the oracle-checkable twin.
# ---------------------------------------------------------------------------
def q43_quantity_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90"),
        F.percentile("l_quantity", F.lit(0.99)).alias("p99"),
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
    )


_Q43_SQL = """
SELECT l_returnflag,
  quantile_cont(l_quantity, 0.5) AS p50,
  quantile_cont(l_quantity, 0.9) AS p90,
  quantile_cont(l_quantity, 0.99) AS p99,
  MIN(l_quantity) AS q_min,
  MAX(l_quantity) AS q_max
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q44 — interval/range join (scale-path operator the reference lacks):
# clicks within the hour before each purchase, via the banded range join —
# one shuffle on (user_id, time-bucket), ≤2 bucket copies per purchase, no
# per-key cartesian, skewed users subdivided by time. Oracle: DuckDB's
# native BETWEEN join. Counts re-aggregate on purchase_id (the left key),
# so purchases with zero prior clicks are restored by a final left join.
# ---------------------------------------------------------------------------
def q44_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.operators.range_join import banded_range_join

    ev = table(spark, sf, "events")
    hour_us = 3_600_000_000
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.unix_micros("ts").alias("click_ts_us"),
    )
    pairs = banded_range_join(
        purchases.withColumnRenamed("user_id", "c_user_id"),
        clicks,
        keys=["c_user_id"],
        left_val="ts_us",
        right_val="click_ts_us",
        lower=-hour_us,
        upper=-1,  # strictly before the purchase
    )
    counts = pairs.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_prior_clicks"))
    return (
        purchases.join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            "ts_us",
            F.coalesce(F.col("n_prior_clicks"), F.lit(0)).alias("n_prior_clicks"),
        )
    )


_Q44_SQL = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS click_ts_us FROM events WHERE event_type = 'click'
)
SELECT p.purchase_id, p.user_id, p.ts_us,
       CAST(COUNT(c.click_ts_us) AS BIGINT) AS n_prior_clicks
FROM p LEFT JOIN c
  ON p.user_id = c.user_id
 AND c.click_ts_us BETWEEN p.ts_us - 3600000000 AND p.ts_us - 1
GROUP BY p.purchase_id, p.user_id, p.ts_us
"""


# ---------------------------------------------------------------------------
# q45 — CUBE over two dimensions (every subtotal combination in ONE
# shuffle via partial-agg expansion; grouping_id() disambiguates subtotal
# rows from real NULLs). The Spark-first replacement for 4 separate
# GROUP BY passes over a 100 TB fact.
# ---------------------------------------------------------------------------
def q45_cube_matrix(spark: SparkSession, sf: str) -> DataFrame:
    # parallel_table: cube expands every row ×4 into decimal buffers
    # (q41's note; no-op at scale)
    orders = parallel_table(spark, sf, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
        F.grouping_id().cast("int").alias("gid"),
    )


_Q45_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
  COUNT(*) AS n_orders,
  {sql_dsum('o_totalprice')} AS sum_price,
  CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# q46 — window frames (the §2.5 surface beyond row_number): lag/lead,
# a ROWS-frame moving sum, and ntile quartiles in a single window pass —
# one shuffle on user_id, total order (ts, event_id) for determinism.
# The moving sum goes through exact DECIMAL addends (frame sums are
# accumulation-order-dependent in raw double).
# ---------------------------------------------------------------------------
def q46_window_frames(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w3 = w.rowsBetween(-2, Window.currentRow)
    return clicks.select(
        "event_id",
        "user_id",
        "ts_us",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.sum(F.col("value").cast(DEC)).over(w3), 2)
        .cast("double")
        .alias("mov_sum3"),
        F.ntile(4).over(w).alias("quartile"),
    )


_Q46_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
  LAG(value) OVER w AS prev_value,
  LEAD(value) OVER w AS next_value,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))) OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS mov_sum3,
  CAST(NTILE(4) OVER w AS INT) AS quartile
FROM events
WHERE event_type = 'click'
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


# ---------------------------------------------------------------------------
# q47 — TPC-H Q21 shape (multi-EXISTS self-correlation): suppliers who
# were the ONLY supplier with a returned line in a multi-supplier order.
# Decorrelated Spark-first: ONE groupBy over lineitem computes both
# correlated existence counts (distinct suppliers / distinct returning
# suppliers per order), the tiny surviving key set broadcasts back onto
# the returned rows, and supplier is a broadcast dim — the fact shuffles
# once, vs. the literal plan's two correlated rescans.
# ---------------------------------------------------------------------------
def q47_lone_return_supplier(spark: SparkSession, sf: str) -> DataFrame:
    # ONE lineitem pass (r12, guide §2.3/§3): aggregate straight to the
    # (orderkey, suppkey) grain — every predicate and the final count are
    # functions of that grain, so the r11 shape's SECOND lineitem scan,
    # its per-order multi-countDistinct Expand (2× every row before the
    # shuffle) and the fact-to-fact join all collapse into one partial-
    # aggregable pass + a window over the aggregated (much smaller) frame.
    # Equivalence: COUNT(DISTINCT l_suppkey) ≡ COUNT(*) over (o,s) groups
    # (NULL suppkeys pre-filtered — countDistinct ignores NULLs and the
    # supplier join dropped them); 'exactly one returning supplier' makes
    # each qualifying order contribute exactly 1 to exactly the pair with
    # ret=1, so COUNT(DISTINCT l_orderkey) per supplier ≡ COUNT(*) over
    # its qualifying pairs. parallel_table: the (o,s) agg is single-task
    # on the one-split file otherwise (q01's note; no-op at scale).
    li = parallel_table(spark, sf, "lineitem")
    supp = table(spark, sf, "supplier")
    pairs = (
        li.where(F.col("l_suppkey").isNotNull())
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
            ).alias("ret")
        )
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        pairs.select(
            "l_orderkey",
            "l_suppkey",
            "ret",
            F.count(F.lit(1)).over(w).alias("n_supp"),
            F.sum("ret").over(w).alias("n_ret_supp"),
        )
        .where(
            (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1) & (F.col("ret") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return top_k(blamed, [F.desc("numwait"), F.asc("s_suppkey")], 10)


_Q47_SQL = """
WITH lone AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) > 1
     AND COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) = 1
)
SELECT s_suppkey, s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
FROM lineitem l
JOIN lone ON l.l_orderkey = lone.l_orderkey
JOIN supplier ON s_suppkey = l.l_suppkey
WHERE l.l_returnflag = 'R'
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q50 — TPC-H Q7 shape: bilateral volume between two nations, the
# role-playing-dimension pattern (nation joined TWICE under different
# roles: customer's vs supplier's). Both nation filters broadcast and
# prune their fact side BEFORE the single big lineitem⋈orders shuffle;
# the (cust_nation, supp_nation, year) agg is a rollup-friendly partial
# agg. Year bucketing via native year() on the NTZ shipdate (tz-free).
# ---------------------------------------------------------------------------
def q50_bilateral_trade(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    pair = ["NATION_1", "NATION_2"]
    n = nation.where(F.col("n_name").isin(pair))
    cust_n = F.broadcast(
        cust.join(F.broadcast(n), cust.c_nationkey == n.n_nationkey).select(
            "c_custkey", F.col("n_name").alias("cust_nation")
        )
    )
    supp_n = F.broadcast(
        supp.join(F.broadcast(n), supp.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    return (
        li.join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == cust_n.c_custkey)
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q50_SQL = f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
  {sql_dsum('l_extendedprice*(1-l_discount)')} AS volume,
  COUNT(*) AS n_lines
FROM lineitem
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name <> sn.n_name
GROUP BY cust_nation, supp_nation, l_year
"""


# ---------------------------------------------------------------------------
# q65 — INTERSECT set-op (closing the §2.7 family with q10's UNION and
# q52's EXCEPT ALL): customers retained across consecutive years.
# `intersect` plans as a distinct-aggregate + null-safe equi-join — one
# shuffle per side on the compared columns, no NOT-IN null traps.
# ---------------------------------------------------------------------------
def q65_retained_customers(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")

    def keys_in(year: int):
        return orders.where(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01"))
        ).select("o_custkey")

    kept = keys_in(1995).intersect(keys_in(1996))
    return (
        kept.join(F.broadcast(cust), kept.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )


_Q65_SQL = """
WITH kept AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  INTERSECT
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
)
SELECT c_mktsegment, COUNT(*) AS n_retained
FROM kept JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q64 — FORWARD as-of join: each purchase matched to the EARLIEST click
# at-or-after it (the "next action" shape — follow-up attribution). The
# operator reuses the backward single-shuffle union-tag plan on a
# negated time axis; the DuckDB oracle applies the same negation trick
# to its (backward-only) native ASOF JOIN.
# ---------------------------------------------------------------------------
def q64_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.operators.asof import asof_join

    ev = table(spark, sf, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts_us"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("ts_us").alias("next_click_us")
    )
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts_us", right_ts="ts_us",
        value_cols=["next_click_us"], direction="forward",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "ts_us",
        "next_click_us",
        (F.col("next_click_us") - F.col("ts_us")).alias("lead_us"),
    )


_Q64_SQL = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS click_us FROM events WHERE event_type = 'click'
), np AS (
  SELECT purchase_id, user_id, -ts_us AS nts FROM p
), nc AS (
  SELECT user_id, -click_us AS ncts FROM c
)
SELECT np.purchase_id, np.user_id, -np.nts AS ts_us,
       -nc.ncts AS next_click_us,
       (-nc.ncts) - (-np.nts) AS lead_us
FROM np ASOF LEFT JOIN nc
  ON np.user_id = nc.user_id AND np.nts >= nc.ncts
"""


# ---------------------------------------------------------------------------
# q63 — funnel / sequence-pattern detection (CEP shape): users with a
# view → click → purchase chain, in order, purchase within 1h of the
# view. ONE shuffle: per-user sorted event array + a linear fold
# carrying (latest view ts, best view-before-a-click ts, found) — the
# greedy invariant "track the LATEST view before each click" dominates
# every other witness, so the fold decides EXISTS(v<c<p, p−v≤1h)
# exactly. The naive relational form is a triple self-join (the oracle);
# this plan reads the fact once and never blows up on active users.
# ---------------------------------------------------------------------------
def q63_funnel_detection(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    hour_us = 3_600_000_000
    # tie rank enforces the oracle's STRICT inequalities at equal
    # timestamps: a purchase must not see a same-instant click (rank 0
    # first), a click must not see a same-instant view (view last)
    rank = (
        F.when(F.col("event_type") == "purchase", 0)
        .when(F.col("event_type") == "click", 1)
        .otherwise(2)
    )
    per_user = (
        ev.where(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("ts"),
                        rank.alias("rk"),
                        F.col("event_type").alias("et"),
                    )
                )
            ).alias("evs")
        )
    )
    res = per_user.select(
        "user_id", funnel_found_expr(F.col("evs"), hour_us).alias("funnel")
    )
    return res.groupBy("funnel").agg(F.count(F.lit(1)).alias("n_users"))


def funnel_found_expr(evs, window_us: int):
    """EXISTS(view < click < purchase, purchase−view ≤ window) over a
    (ts, rk, et)-sorted event array, as a linear fold. State: latest view
    ts, max view-ts preceding any click, found."""
    neg = F.lit(-(1 << 62)).cast("bigint")
    state0 = F.struct(neg.alias("v"), neg.alias("vc"), F.lit(False).alias("found"))

    def step(acc, e):
        v2 = F.when(e["et"] == "view", F.greatest(acc["v"], e["ts"])).otherwise(acc["v"])
        vc2 = F.when(e["et"] == "click", F.greatest(acc["vc"], acc["v"])).otherwise(acc["vc"])
        found2 = acc["found"] | (
            (e["et"] == "purchase") & (acc["vc"] >= e["ts"] - window_us)
        )
        return F.struct(v2.alias("v"), vc2.alias("vc"), found2.alias("found"))

    return F.aggregate(evs, state0, step).getField("found")


_Q63_SQL = """
WITH funnel_users AS (
  SELECT DISTINCT v.user_id
  FROM events v
  JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
               AND epoch_us(c.ts) > epoch_us(v.ts)
  JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
               AND epoch_us(p.ts) > epoch_us(c.ts)
               AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
  WHERE v.event_type = 'view'
), base AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
)
SELECT b.user_id IN (SELECT user_id FROM funnel_users) AS funnel,
       COUNT(*) AS n_users
FROM base b GROUP BY funnel
"""


# ---------------------------------------------------------------------------
# q62 — salted skew-mitigated aggregation: COUNT + exact SUM per event
# type where the partial phase spreads each hot key over 16 salt buckets
# before the final combine. The salt is internal — the RESULT is
# identical to the plain groupBy (the oracle proves it), only the
# shuffle distribution changes. DECIMAL partials keep the two-phase sum
# bit-exact (decimal addition is associative; double is not).
# ---------------------------------------------------------------------------
def q62_salted_aggregation(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    salted = ev.withColumn("_salt", (F.rand(42) * 16).cast("int"))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value").cast(DEC)).alias("_sum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("_n").alias("n_events"),
        F.round(F.sum("_sum"), 2).cast("double").alias("total_value"),
    )


_Q62_SQL = f"""
SELECT event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS total_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q61 — RANGE window frames (time-based, not row-based): per user, the
# count and exact sum of click values in the TRAILING HOUR of event time
# — the "rate over sliding physical window" shape. The frame bound is an
# epoch-µs integer range (tz-free, identical in both engines); one
# window pass, one shuffle on user_id. percent_rank over the same total
# order covers the remaining rank-family surface.
# ---------------------------------------------------------------------------
def q61_trailing_hour_window(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    hour_us = 3_600_000_000
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    wrange = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-hour_us, Window.currentRow)
    )
    wrank = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return clicks.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(wrange).alias("n_last_hour"),
        F.round(F.sum(F.col("value").cast(DEC)).over(wrange), 2)
        .cast("double")
        .alias("sum_last_hour"),
        F.round(F.percent_rank().over(wrank).cast("decimal(24,10)"), 6)
        .cast("double")
        .alias("pct_rank"),
    )


_Q61_SQL = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
  COUNT(*) OVER wr AS n_last_hour,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6))) OVER wr, 2) AS DOUBLE) AS sum_last_hour,
  CAST(ROUND(CAST(percent_rank() OVER wk AS DECIMAL(24,10)), 6) AS DOUBLE) AS pct_rank
FROM events
WHERE event_type = 'click'
WINDOW
  wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
  wk AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


# ---------------------------------------------------------------------------
# q56 — TPC-H Q13 shape: customer order-count distribution — LEFT join so
# zero-order customers survive, then an aggregation OF an aggregation
# (count per customer → histogram of counts). Two shuffles, both on
# shrinking keys (custkey → count); the second input is one row per
# customer, so the histogram agg is nearly free.
# ---------------------------------------------------------------------------
def q56_order_count_histogram(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


_Q56_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# q57 — TPC-H Q22 shape: rich-but-inactive customers — a global scalar
# (avg positive balance) feeding a filter, plus NOT EXISTS as a left-anti
# join. The scalar is a 1-row broadcast cross join (no driver round-trip,
# no rescan); the anti join broadcasts the distinct order keys only after
# aggregation. davg keeps the threshold engine-exact.
# ---------------------------------------------------------------------------
def q57_inactive_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    inactive = rich.join(
        orders.select("o_custkey").distinct(),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return inactive.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


_Q57_SQL = f"""
SELECT c_mktsegment,
  COUNT(*) AS numcust,
  {sql_dsum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {sql_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q55 — TPC-H Q8 shape: market share (conditional-sum / sum ratio per
# year). The numerator is a CASE inside the SAME aggregation pass as the
# denominator — one shuffle computes both, vs. the naive two-query/self
# -join form. Exact DECIMAL sums keep the ratio engine-identical; the
# division happens on the rounded decimal-sourced doubles (per-row IEEE
# division is deterministic).
# ---------------------------------------------------------------------------
def q55_market_share(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    region = table(spark, sf, "region")
    cust_r = F.broadcast(
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "REGION_1")
        .select("c_custkey")
    )
    supp_n = F.broadcast(
        supp.join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name"))),
            supp.s_nationkey == F.col("s_nk"),
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_r, orders.o_custkey == cust_r.c_custkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(target).alias("target_volume"),
            dsum(vol).alias("total_volume"),
        )
    )
    return agg.select(
        "o_year",
        "target_volume",
        "total_volume",
        F.round(
            (F.col("target_volume") / F.col("total_volume")).cast("decimal(24,10)"), 6
        )
        .cast("double")
        .alias("mkt_share"),
    )


_Q55_SQL = f"""
WITH agg AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
    {sql_dsum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice*(1-l_discount) ELSE 0.0 END")} AS target_volume,
    {sql_dsum('l_extendedprice*(1-l_discount)')} AS total_volume
  FROM lineitem
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'REGION_1'
  GROUP BY o_year
)
SELECT o_year, target_volume, total_volume,
  CAST(ROUND(CAST(target_volume / total_volume AS DECIMAL(24,10)), 6) AS DOUBLE) AS mkt_share
FROM agg
"""


# ---------------------------------------------------------------------------
# q51 — TPC-H Q15 shape: top supplier(s) by quarterly revenue — an
# aggregate filtered against its own global max (ties kept). Spark-first
# decorrelation: revenue agg once (one shuffle), global max as a 1-row
# broadcast cross join (no second scan, no driver round-trip), filter.
# ---------------------------------------------------------------------------
def q51_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    supp = table(spark, sf, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    best = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q51_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
    {sql_dsum("l_extendedprice*(1-l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# q52 — multiset set-ops (§2.7 beyond the reference's implicit unions):
# customers ordering in 1995 but not 1996 via exceptAll on key multisets,
# then distinct + broadcast-join back for names. exceptAll plans as a
# single hash aggregation over tagged counts — one shuffle, no N²
# NOT-IN semantics, null-safe by construction.
# ---------------------------------------------------------------------------
def q52_except_customers(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")

    def keys_in(year: int):
        return orders.where(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01"))
        ).select("o_custkey")

    lost = keys_in(1995).exceptAll(keys_in(1996)).distinct()
    return (
        lost.join(F.broadcast(cust), lost.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_Q52_SQL = """
WITH lost AS (
  SELECT DISTINCT o_custkey FROM (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT ALL
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  ) t
)
SELECT c_custkey, c_name, c_mktsegment
FROM lost JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# q53 — argmax/argmin aggregates (max_by/min_by): the single-pass
# replacement for the DISTINCT-ON window when only one column is wanted.
# Ordering key is a (value, event_id) struct so ties resolve
# deterministically in both engines.
# ---------------------------------------------------------------------------
def q53_argmax_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    ordkey = F.struct(F.col("value"), F.col("event_id"))
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", ordkey).alias("top_event_id"),
        F.min_by("event_id", ordkey).alias("bottom_event_id"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
    )


_Q53_SQL = """
SELECT event_type,
  first(event_id ORDER BY value DESC, event_id DESC) AS top_event_id,
  first(event_id ORDER BY value ASC, event_id ASC) AS bottom_event_id,
  MAX(value) AS max_value,
  MIN(value) AS min_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q49 — VariantType JSON path (the modern twin of q13's get_json_object):
# try_parse_json parses each payload ONCE into Spark 4's binary Variant
# encoding; every subsequent variant_get is a typed offset lookup, not a
# string re-parse — the right shape when one 100 TB payload column feeds
# many extractions. try_* keeps ANSI mode null-on-malformed. Per-event
# typed extraction + a variant-derived filter, then the same agg as q13
# (oracle: plain JSON SQL — the value surface is identical, only the
# physical encoding differs).
# ---------------------------------------------------------------------------
def q49_variant_extract(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    # No isNotNull filter on the DERIVED k_val: Catalyst substitutes the
    # whole parse_json chain into the pushed-down predicate and every
    # surviving row parses props TWICE (the ml/dedup.py minhash_bands trap,
    # r6 sweep). NULL handling folds into the aggregates instead —
    # count(k_val)/sum skip NULLs, when(NULL % 2 == 0) never fires — and
    # the HAVING on the aggregated count drops all-NULL groups exactly as
    # the row filter did. One parse per row, as the header promises.
    return (
        ev.withColumn("k_val", k)
        .groupBy("event_type")
        .agg(
            F.count("k_val").alias("n_with_k"),
            F.sum("k_val").alias("sum_k"),
            F.count(F.when(F.col("k_val") % 2 == 0, 1)).alias("n_even"),
        )
        .where(F.col("n_with_k") > 0)
    )


_Q49_SQL = """
SELECT event_type,
  COUNT(*) AS n_with_k,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
  COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 2 = 0 THEN 1 END) AS n_even
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q35 — approx distinct (A6 at scale: HLL sketch instead of exact shuffle).
# HLL estimates differ across engines, so the sketch itself can't be
# hash-matched; instead the query EMITS ITS OWN ACCURACY CLAIM — a boolean
# "within ±5% of exact" per group — alongside the exact count, and the
# oracle asserts the claim is always TRUE. A drifting HLL flips the flag
# and fails the hash match, so the driver row is a real check, not
# rows-only. (tests/test_approx.py additionally asserts the numeric gap.)
# ---------------------------------------------------------------------------
def q35_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col("exact_users")
    # all-NULL user_ids → exact = 0; the claim is then approx == 0 (a bare
    # division would yield NULL and hash-mismatch the oracle's TRUE).
    # The gate-mode query computes BOTH counts to verify the sketch; the
    # production A6 path (report.daily_digest approx=True) runs HLL only.
    claim = F.when(
        F.col("exact_users") == 0, F.col("approx_users") == 0
    ).otherwise(err <= 0.05)
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        claim.alias("approx_within_5pct"),
    )


_Q35_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       COUNT(*) AS n_events,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q66 — TPC-H Q11 shape (important stock): per-part revenue filtered against
# a FRACTION of the global total over the same restricted set. The global
# scalar is re-aggregated from the per-part aggregate (no second scan of
# lineitem) and broadcast as a 1-row cross join. Threshold compare is done
# in IEEE double (`v * 2500 > tot`) after engine-exact DECIMAL sums — a
# double multiply is bit-deterministic in both engines, decimal×int widths
# are not. No partsupp table in the driver data, so the "stock value" is
# revenue from suppliers of one nation (reference shape: dbt incremental
# threshold scans, SURVEY §2.4 A5 generalized to a fraction).
# ---------------------------------------------------------------------------
def q66_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    nat_supp = F.broadcast(
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .where(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    per_part = (
        li.join(nat_supp, li.l_suppkey == nat_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_value"))
    )
    # Global total as a window over the per-part aggregate, NOT a second
    # aggregation branch: Spark re-executes un-materialized subtrees per
    # consumer, so the agg-then-cross-join form scans lineitem twice. The
    # single-partition window only shuffles |parts| narrow rows.
    total = (
        F.round(F.sum(F.col("part_value").cast(DEC)).over(Window.partitionBy()), 2)
        .cast("double")
    )
    return (
        per_part.withColumn("total_value", total)
        .where(F.col("part_value") * 2500 > F.col("total_value"))
        .select("l_partkey", "part_value")
    )


_Q66_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         {sql_dsum('l_extendedprice*(1-l_discount)')} AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part,
     (SELECT CAST(ROUND(SUM(CAST(part_value AS DECIMAL(30,6))), 2) AS DOUBLE)
        AS total_value FROM per_part) t
WHERE part_value * 2500 > total_value
"""


# ---------------------------------------------------------------------------
# q67 — TPC-H Q19 shape: disjunctive OR-of-ANDs join predicate mixing
# columns from both sides. Catalyst extracts the common l_partkey=p_partkey
# equi-key for the (broadcast) hash join and keeps the disjunction as a
# join filter; the per-side conjuncts (brand/size on part) are pushed to
# the scans via CNF conversion — at 100 TB the part scan prunes before the
# join instead of filtering after.
# ---------------------------------------------------------------------------
def q67_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disjunct = (
        ((brand == "Brand#12") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#19") & size.between(1, 25) & qty.between(10, 20))
        | ((brand == "Brand#23") & size.between(1, 35) & qty.between(20, 30))
    )
    joined = li.join(F.broadcast(part), (li.l_partkey == part.p_partkey) & disjunct)
    return joined.agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q67_SQL = f"""
SELECT {sql_dsum('l_extendedprice*(1-l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
 AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))
"""


# ---------------------------------------------------------------------------
# q68 — TPC-H Q2 shape: per-group correlated MIN with join-back (cheapest
# supplier per part). The correlated subquery decorrelates to ONE window
# min over the (part,supplier) aggregate — no re-scan, no self-join; ties
# (several suppliers at the exact min) are all emitted, matching the SQL.
# Unit cost = min observed l_extendedprice/l_quantity — IEEE division, so
# the min and the equality join-back are bit-exact in both engines.
# ---------------------------------------------------------------------------
def q68_cheapest_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    supp = table(spark, sf, "supplier")
    std_parts = F.broadcast(
        part.where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)).select(
            "p_partkey", "p_size"
        )
    )
    supply = (
        li.join(std_parts, li.l_partkey == std_parts.p_partkey)
        .groupBy("p_partkey", "p_size", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    best = supply.withColumn("min_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey",
            "p_size",
            "s_name",
            dround(F.col("unit_cost"), 4).alias("unit_cost"),
        )
    )


_Q68_SQL = f"""
WITH supply AS (
  SELECT p_partkey, p_size, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'STANDARD' AND p_size <= 10
  GROUP BY p_partkey, p_size, l_suppkey
)
SELECT p_partkey, p_size, s_name,
       {sql_dround('unit_cost', 4)} AS unit_cost
FROM supply s
JOIN supplier ON l_suppkey = s_suppkey
WHERE unit_cost = (SELECT MIN(unit_cost) FROM supply s2
                   WHERE s2.p_partkey = s.p_partkey)
"""


# ---------------------------------------------------------------------------
# q69 — TPC-H Q16 shape: supplier-count per part attribute with a NOT-IN
# exclusion subquery. The NOT IN becomes a broadcast LEFT ANTI join
# (s_suppkey is non-null so the null-trap semantics coincide), then one
# shuffle for the grouped COUNT(DISTINCT). Excluded set = suppliers in
# deficit (s_acctbal < 0) — the Q16 "complaints" predicate over the
# driver's schema.
# ---------------------------------------------------------------------------
def q69_supplier_diversity(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    part = table(spark, sf, "part")
    supp = table(spark, sf, "supplier")
    bad = F.broadcast(supp.where(F.col("s_acctbal") < 0).select("s_suppkey"))
    sized = F.broadcast(
        part.where(
            (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        ).select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(sized, li.l_partkey == sized.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q69_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q70 — TPC-H Q4 shape: EXISTS-correlated priority count. The EXISTS
# (some line shipped after the order date) becomes a LEFT SEMI join with an
# equi-key plus a cross-side inequality — one shuffle on o_orderkey, the
# quarter filter prunes the orders scan before it. At 100 TB the orders
# side shrinks ~50× before the shuffle; lineitem carries only 2 columns.
# ---------------------------------------------------------------------------
def q70_priority_late_ship(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    quarter = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    )
    late = quarter.join(
        li,
        (quarter.o_orderkey == li.l_orderkey) & (li.l_shipdate > quarter.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


_Q70_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q71 — TPC-H Q9 shape (product-type profit): 5-table star join with THREE
# broadcast dims (part filtered by name, supplier+nation pre-joined) and one
# big-big shuffle join lineitem⋈orders on the orderkey — the classic
# co-partition candidate (bucket both on orderkey at 100 TB and this plan
# goes Exchange-free; see operators/bucketing.py). Profit uses retailprice
# as the cost proxy (no partsupp table in the driver data).
# ---------------------------------------------------------------------------
def q71_nation_profit(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    gear = F.broadcast(
        table(spark, sf, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    nat_supp = F.broadcast(
        table(spark, sf, "supplier")
        .join(F.broadcast(table(spark, sf, "nation")), F.expr("s_nationkey = n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.5
    return (
        li.join(gear, li.l_partkey == gear.p_partkey)
        .join(nat_supp, li.l_suppkey == nat_supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("profit"))
    )


_Q71_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       {sql_dsum("l_extendedprice*(1-l_discount) - p_retailprice*l_quantity*0.5::DOUBLE")}
         AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
"""


# ---------------------------------------------------------------------------
# q72 — TPC-H Q10 shape (returned-item ranking): aggregate revenue per
# custkey FIRST, join the customer/nation dims AFTER the agg — the shuffle
# carries |customers| rows, not |lineitem|, and the dims broadcast. Top-20
# is TakeOrderedAndProject with c_custkey as the deterministic tie-break.
# ---------------------------------------------------------------------------
def q72_returned_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    nation = table(spark, sf, "nation")
    quarter = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        li.where(F.col("l_returnflag") == "R")
        .join(quarter, li.l_orderkey == quarter.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    enriched = per_cust.join(
        F.broadcast(cust), per_cust.o_custkey == cust.c_custkey
    ).join(F.broadcast(nation), F.expr("c_nationkey = n_nationkey"))
    return top_k(
        enriched.select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue"),
        [F.desc("revenue"), F.asc("c_custkey")],
        20,
    )


_Q72_SQL = f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
       {sql_dsum('l_extendedprice*(1-l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q73 — TPC-H Q12 shape: big-big join with conditional CASE counts per
# group (high- vs low-priority lines per linestatus). Both CASE sums come
# out of ONE partial+final hash agg — no second pass, no pivot shuffle.
# ---------------------------------------------------------------------------
def q73_priority_by_status(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    year = li.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        year.join(orders, year.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


_Q73_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# q74 — TPC-H Q14 shape (promo revenue ratio): conditional numerator and
# total denominator in one agg pass, ratio as IEEE double division of the
# two engine-exact decimal sums (bit-deterministic), rounded via decimal.
# ---------------------------------------------------------------------------
def q74_promo_share(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    promo_parts = F.broadcast(table(spark, sf, "part").select("p_partkey", "p_type"))
    month = li.where(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        month.join(promo_parts, month.l_partkey == promo_parts.p_partkey)
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)).alias(
                "promo_revenue"
            ),
            dsum(rev).alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        dround(100 * F.col("promo_revenue") / F.col("total_revenue"), 4).alias(
            "promo_pct"
        ),
    )


_Q74_SQL = f"""
WITH agg AS (
  SELECT {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0.0::DOUBLE END")}
           AS promo_revenue,
         {sql_dsum('l_extendedprice*(1-l_discount)')} AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
)
SELECT promo_revenue, total_revenue,
       {sql_dround('100 * promo_revenue / total_revenue', 4)} AS promo_pct
FROM agg
"""


# ---------------------------------------------------------------------------
# q75 — mergeable quantile sketch (approx_percentile's missing merge API):
# equi-width histogram sketch per priority, built as TWO date-half sketches
# then merged (union + re-sum — associative, the continuous-aggregate
# property), quantiles read off the merged state. The merge shuffles ≤
# nbins rows per group instead of re-scanning facts — the incremental
# refresh path at 100 TB. Deterministic bin-edge estimates → exact oracle
# parity (the single-pass SQL equals any merge tree). Error ≤ (hi-lo)/nbins.
# ---------------------------------------------------------------------------
_Q75_ARGS = dict(lo=0.0, hi=500_000.0, nbins=1000)
_Q75_QS = {"p50_est": 0.5, "p90_est": 0.9}


def q75_quantile_sketch(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.operators.sketch import (
        histogram_sketch,
        merge_sketches,
        sketch_quantiles,
    )

    orders = table(spark, sf, "orders")
    split = F.col("o_orderdate") < F.lit("1998-01-01")
    halves = [
        histogram_sketch(orders.where(cond), "o_totalprice", ["o_orderpriority"], **_Q75_ARGS)
        for cond in (split, ~split)
    ]
    merged = merge_sketches(["o_orderpriority"], *halves)
    return sketch_quantiles(merged, ["o_orderpriority"], _Q75_QS, **_Q75_ARGS)


def _q75_sql() -> str:
    from job_etl_spark.operators.sketch import sql_sketch_quantiles

    return sql_sketch_quantiles(
        "orders", "o_totalprice", ["o_orderpriority"], _Q75_QS, **_Q75_ARGS
    )


# ---------------------------------------------------------------------------
# q79 — TPC-H Q5 shape (local supplier volume): 6-table star join where the
# customer and the supplier must share a nation. Nations-in-region is a
# tiny broadcast applied to BOTH customer and supplier BEFORE the fact
# shuffles, so off-region rows never enter an Exchange; the c=s nation
# equality is a post-join filter (it correlates the two broadcast-pruned
# sides, so it can't prune earlier). Only two big-big shuffles survive:
# lineitem⋈orders on orderkey, then ⋈customer on custkey. Completes the
# TPC-H sweep — all 22 query shapes now have a oracle-paired twin.
# ---------------------------------------------------------------------------
def q79_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    supp = table(spark, sf, "supplier")
    nation = table(spark, sf, "nation")
    region = table(spark, sf, "region")

    asia = F.broadcast(
        nation.join(
            region.where(F.col("r_name") == "ASIA"),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    cust_n = cust.join(asia, cust.c_nationkey == asia.n_nationkey).select(
        "c_custkey", F.col("n_nationkey").alias("c_nkey")
    )
    supp_n = F.broadcast(
        supp.join(asia, supp.s_nationkey == asia.n_nationkey).select(
            "s_suppkey", F.col("n_nationkey").alias("s_nkey"), "n_name"
        )
    )
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(cust_n, o.o_custkey == cust_n.c_custkey)
        .where(F.col("c_nkey") == F.col("s_nkey"))
        .groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
    )


_Q79_SQL = f"""
SELECT n_name, {sql_dsum('l_extendedprice*(1-l_discount)')} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q80 — TPC-H Q6 shape (forecast revenue change): the pure scan-side query —
# every predicate pushes to the parquet reader (PushedFilters carries all
# four), the scan reads 4 of 11 columns, and one partial+final agg returns
# a single row. The 100 TB story is entirely in the scan: row-group stats
# skip non-matching files, and the map-side partial leaves one double per
# partition to shuffle.
# ---------------------------------------------------------------------------
def q80_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q80_SQL = f"""
SELECT {sql_dsum('l_extendedprice*l_discount')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q81 — explicit GROUPING SETS (non-hierarchical subtotal selection, the
# general form of q41's ROLLUP / q45's CUBE): (status, priority), (priority),
# and grand total — note the (status)-only level is deliberately absent,
# which neither ROLLUP nor CUBE can express. Spark expands the sets over one
# scan and a single Expand+hash-agg (no per-set rescans); grouping flags
# disambiguate NULL-as-subtotal from NULL data.
# ---------------------------------------------------------------------------
def q81_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    return (
        orders.groupingSets(
            [
                [F.col("o_orderstatus"), F.col("o_orderpriority")],
                [F.col("o_orderpriority")],
                [],
            ],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_total"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        )
    )


_Q81_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  {sql_dsum('o_totalprice')} AS sum_total,
  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
"""


# ---------------------------------------------------------------------------
# q82 — gap-filled time series (calendar spine + forward fill): hourly
# purchase aggregates joined onto a dense hour spine generated from the
# observed [min, max] bucket range; missing hours get n_events=0 and carry
# the last observed hourly average forward (last_value IGNORE NULLS).
# Buckets are tz-free epoch-µs integers (q36's convention). The spine is
# bounded (#hours, not #events), so the unpartitioned fill window is cheap;
# at 100 TB the same fill runs partitioned per series key.
# ---------------------------------------------------------------------------
_HOUR_US = 3_600_000_000


def q82_gap_filled_hours(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf, "events").where(F.col("event_type") == "purchase")
    bucket = F.expr(f"unix_micros(ts) div {_HOUR_US} * {_HOUR_US}")
    agg = ev.groupBy(bucket.alias("hour_us")).agg(
        F.count(F.lit(1)).alias("n_events"),
        davg(F.col("value")).alias("avg_value"),
    )
    spine = (
        agg.agg(F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi", F.lit(_HOUR_US))).alias("hour_us"))
    )
    fill = Window.orderBy("hour_us").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(agg, "hour_us", "left")
        .select(
            "hour_us",
            F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(fill).alias("avg_value_filled"),
        )
    )


_Q82_SQL = f"""
WITH agg AS (
  SELECT (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS hour_us,
         COUNT(*) AS n_events,
         {sql_davg('value')} AS avg_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), spine AS (
  SELECT unnest(generate_series((SELECT MIN(hour_us) FROM agg),
                                (SELECT MAX(hour_us) FROM agg),
                                {_HOUR_US})) AS hour_us
)
SELECT spine.hour_us,
  COALESCE(n_events, 0) AS n_events,
  last_value(avg_value IGNORE NULLS) OVER (
    ORDER BY spine.hour_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS avg_value_filled
FROM spine LEFT JOIN agg USING (hour_us)
"""


# ---------------------------------------------------------------------------
# q83 — percentile-trimmed aggregation (robust stats): per event_type,
# compute exact p05/p95 bounds, keep only in-range rows, re-aggregate.
# The bounds table is one row per group → broadcast back onto the fact, so
# the fact scans twice but never shuffles wide (group-local partial aggs
# both passes). Exact percentile interpolation is IEEE-identical across
# engines (q43); at 100 TB the swap-in is approx_percentile bounds.
# ---------------------------------------------------------------------------
def q83_trimmed_stats(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .where((F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            davg(F.col("value")).alias("trimmed_avg"),
            F.min("value").alias("kept_min"),
            F.max("value").alias("kept_max"),
        )
    )


_Q83_SQL = f"""
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
  COUNT(*) AS n_kept,
  {sql_davg('value')} AS trimmed_avg,
  MIN(value) AS kept_min,
  MAX(value) AS kept_max
FROM events e JOIN b USING (event_type)
WHERE value >= lo AND value <= hi
GROUP BY e.event_type
"""


QUERIES: dict[str, Query] = {
    "q01_pricing_summary": Query(q01_pricing_summary, _Q01_SQL),
    "q02_regional_revenue": Query(q02_regional_revenue, _Q02_SQL),
    "q03_topk_orders": Query(q03_topk_orders, _Q03_SQL),
    "q04_priority_stats": Query(q04_priority_stats, _Q04_SQL),
    "q05_first_order_per_customer": Query(q05_first_order_per_customer, _Q05_SQL),
    "q06_customers_without_orders": Query(q06_customers_without_orders, _Q06_SQL),
    "q07_active_customers_by_segment": Query(q07_active_customers_by_segment, _Q07_SQL),
    "q08_merge_upsert": Query(q08_merge_upsert, _Q08_SQL),
    "q09_watermark_incremental": Query(q09_watermark_incremental, _Q09_SQL),
    "q10_union_sources": Query(q10_union_sources, _Q10_SQL),
    "q11_running_user_totals": Query(q11_running_user_totals, _Q11_SQL),
    "q12_topk_per_type": Query(q12_topk_per_type, _Q12_SQL),
    "q13_json_extract": Query(q13_json_extract, _Q13_SQL),
    "q33_recent_events": Query(q33_recent_events, _Q33_SQL),
    "q34_sessionize": Query(q34_sessionize, _Q34_SQL),
    "q35_approx_distinct": Query(
        q35_approx_distinct,
        _Q35_SQL,
        note="HLL estimate is hash-checked via its own ±5% accuracy claim",
    ),
    "q36_hourly_rollup": Query(q36_hourly_rollup, _Q36_SQL),
    "q37_asof_join": Query(q37_asof_join, _Q37_SQL),
    "q38_small_qty_revenue": Query(q38_small_qty_revenue, _Q38_SQL),
    "q39_large_volume_orders": Query(q39_large_volume_orders, _Q39_SQL),
    "q40_red_part_suppliers": Query(q40_red_part_suppliers, _Q40_SQL),
    "q41_rollup_hierarchy": Query(q41_rollup_hierarchy, _Q41_SQL),
    "q42_pivot_status": Query(q42_pivot_status, _Q42_SQL),
    "q43_quantity_percentiles": Query(q43_quantity_percentiles, _Q43_SQL),
    "q44_interval_join": Query(q44_interval_join, _Q44_SQL),
    "q45_cube_matrix": Query(q45_cube_matrix, _Q45_SQL),
    "q46_window_frames": Query(q46_window_frames, _Q46_SQL),
    "q47_lone_return_supplier": Query(q47_lone_return_supplier, _Q47_SQL),
    "q49_variant_extract": Query(q49_variant_extract, _Q49_SQL),
    "q50_bilateral_trade": Query(q50_bilateral_trade, _Q50_SQL),
    "q51_top_supplier": Query(q51_top_supplier, _Q51_SQL),
    "q52_except_customers": Query(q52_except_customers, _Q52_SQL),
    "q53_argmax_aggregates": Query(q53_argmax_aggregates, _Q53_SQL),
    "q55_market_share": Query(q55_market_share, _Q55_SQL),
    "q56_order_count_histogram": Query(q56_order_count_histogram, _Q56_SQL),
    "q57_inactive_rich_customers": Query(q57_inactive_rich_customers, _Q57_SQL),
    "q61_trailing_hour_window": Query(q61_trailing_hour_window, _Q61_SQL),
    "q62_salted_aggregation": Query(q62_salted_aggregation, _Q62_SQL),
    "q63_funnel_detection": Query(q63_funnel_detection, _Q63_SQL),
    "q64_asof_forward": Query(q64_asof_forward, _Q64_SQL),
    "q65_retained_customers": Query(q65_retained_customers, _Q65_SQL),
    "q66_important_parts": Query(q66_important_parts, _Q66_SQL),
    "q67_disjunctive_revenue": Query(q67_disjunctive_revenue, _Q67_SQL),
    "q68_cheapest_supplier": Query(q68_cheapest_supplier, _Q68_SQL),
    "q69_supplier_diversity": Query(q69_supplier_diversity, _Q69_SQL),
    "q70_priority_late_ship": Query(q70_priority_late_ship, _Q70_SQL),
    "q71_nation_profit": Query(q71_nation_profit, _Q71_SQL),
    "q72_returned_revenue": Query(q72_returned_revenue, _Q72_SQL),
    "q73_priority_by_status": Query(q73_priority_by_status, _Q73_SQL),
    "q74_promo_share": Query(q74_promo_share, _Q74_SQL),
    "q75_quantile_sketch": Query(q75_quantile_sketch, _q75_sql()),
    "q79_local_supplier_volume": Query(q79_local_supplier_volume, _Q79_SQL),
    "q80_forecast_revenue": Query(q80_forecast_revenue, _Q80_SQL),
    "q81_grouping_sets": Query(q81_grouping_sets, _Q81_SQL),
    "q82_gap_filled_hours": Query(q82_gap_filled_hours, _Q82_SQL),
    "q83_trimmed_stats": Query(q83_trimmed_stats, _Q83_SQL),
}
