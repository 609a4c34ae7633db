"""Reference-domain semantics (SURVEY.md §2.8/2.10) exercised on the driver
tables: identity hashing (U1), normalization (U2), seniority cascade (U4),
fuzzy company matching (J7), dictionary skills extraction (U5), and the
weighted explainable ranker (U7) — all as native column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from job_etl_spark.functions.identity import company_id_expr, hash_key_expr
from job_etl_spark.functions.numeric import salary_bounds_exprs
from job_etl_spark.functions.text import seniority_case_sql, seniority_level_expr, validate_enum_expr
from job_etl_spark.functions.timeparse import parse_timestamp_expr
from job_etl_spark.operators import top_k
from job_etl_spark.queries._util import Query, dround, sql_dround
from job_etl_spark.tables import parallel_table, table

# Unicode-whitespace class for RE2 (DuckDB): ASCII \s is not enough — the
# Spark side uses (?U)\s = Unicode White_Space for Python-strip parity.
# [\t\n\x0b\f\r\x85 + all separator categories] == White_Space.
_WS_CLASS = r"[\t\n\x0b\f\r\x85\p{Z}]"
_WS = f"'{_WS_CLASS}+'"  # duckdb regex literal (no backslash escape processing)
_TRIM = f"'(^{_WS_CLASS}+)|({_WS_CLASS}+$)'"  # python-strip semantics


def _sql_norm(x: str) -> str:
    # coalesce-to-'' mirrors hash_key_expr's explicit NULL handling (|| in
    # DuckDB would propagate NULL through the whole hash)
    return (
        "lower(regexp_replace(regexp_replace("
        f"coalesce({x}, ''), {_TRIM}, '', 'g'), {_WS}, ' ', 'g'))"
    )


def _sql_hash3(a: str, b: str, c: str) -> str:
    parts = [_sql_norm(x) for x in (a, b, c)]
    return f"md5({parts[0]} || '|' || {parts[1]} || '|' || {parts[2]})"


# ---------------------------------------------------------------------------
# q14 — deterministic identity hash (U1): hash_key + company_id, case/ws-proof
# ---------------------------------------------------------------------------
def q14_hash_identity(spark: SparkSession, sf: str) -> DataFrame:
    cust = table(spark, sf, "customer")
    nation = table(spark, sf, "nation")
    df = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    # messy casing/whitespace in the inputs proves normalization stability
    company = F.concat(F.lit("  "), F.upper("c_name"), F.lit("   Inc  "))
    title = F.concat(F.lit("Data  Engineer "), F.col("c_mktsegment"))
    location = F.concat(F.lower("n_name"), F.lit(" ,  remote"))
    return df.select(
        "c_custkey",
        hash_key_expr(company, title, location).alias("hash_key"),
        company_id_expr(F.upper("c_name")).alias("company_id"),
    )


_Q14_SQL = f"""
SELECT c_custkey,
  {_sql_hash3("'  ' || upper(c_name) || '   Inc  '",
              "'Data  Engineer ' || c_mktsegment",
              "lower(n_name) || ' ,  remote'")} AS hash_key,
  md5({_sql_norm("coalesce(upper(c_name), 'unknown')")}) AS company_id
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


# ---------------------------------------------------------------------------
# q15 — seniority cascade (U4): order-sensitive regex/substring cascade
# ---------------------------------------------------------------------------
_TITLES = [
    "Engineer III",
    "Engineer II",
    "Engineer I",
    "Senior Data Engineer",
    "Sr. Developer",
    "VP of Engineering",
    "Software Intern",
    "Mid-Level Developer",
    "Jr Analyst",
    "Staff Engineer",
    "L5 Software Engineer",
    "Architecture Specialist",  # must NOT match \barchitect\b → unknown
]


def q15_seniority_cascade(spark: SparkSession, sf: str) -> DataFrame:
    # parallel_table (r12): the ~14-regex seniority cascade is per-row
    # heavy, and the one-split bench file ran it in a single task — the
    # r11 fan-out class (q01's note; guarded no-op at scale)
    part = parallel_table(spark, sf, "part")
    title = F.concat(
        F.col("p_brand"),
        F.lit(" "),
        F.element_at(
            F.array(*[F.lit(t) for t in _TITLES]),
            (F.pmod(F.col("p_partkey"), F.lit(12)) + 1).cast("int"),
        ),
    )
    return part.select(
        "p_partkey",
        title.alias("title"),
        seniority_level_expr(title).alias("seniority_level"),
    )


_TITLES_SQL = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in _TITLES) + "]"
_Q15_SQL = f"""
WITH titled AS (
  SELECT p_partkey,
         p_brand || ' ' || ({_TITLES_SQL})[CAST(p_partkey % 12 AS INT) + 1] AS title
  FROM part
)
SELECT p_partkey, title, {seniority_case_sql('title')} AS seniority_level
FROM titled
"""


# ---------------------------------------------------------------------------
# q16 — normalization semantics (U2): enum default, salary swap, ts parsing
# ---------------------------------------------------------------------------
def q16_normalize_semantics(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    lo, hi = salary_bounds_exprs(F.col("l_tax"), F.col("l_discount"))
    iso = F.concat(F.date_format("l_shipdate", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z"))
    epoch_str = (F.col("l_orderkey") * 86400 + 1000000000).cast("string")
    return li.where(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        validate_enum_expr(F.col("l_returnflag"), ["a", "n", "r"], "unknown").alias("flag_norm"),
        validate_enum_expr(F.col("l_linestatus"), ["o"], "unknown").alias("status_norm"),
        dround(lo, 4).alias("bound_lo"),
        dround(hi, 4).alias("bound_hi"),
        F.unix_seconds(parse_timestamp_expr(iso)).alias("posted_epoch"),
        F.unix_seconds(parse_timestamp_expr(epoch_str)).alias("epoch_roundtrip"),
        F.unix_seconds(parse_timestamp_expr(F.lit("not-a-date"))).alias("invalid_parse"),
    )


_Q16_SQL = f"""
SELECT l_orderkey,
  CASE WHEN l_returnflag IS NULL OR l_returnflag = '' THEN 'unknown'
       WHEN lower(trim(l_returnflag)) IN ('a','n','r') THEN lower(trim(l_returnflag))
       ELSE 'unknown' END AS flag_norm,
  CASE WHEN l_linestatus IS NULL OR l_linestatus = '' THEN 'unknown'
       WHEN lower(trim(l_linestatus)) IN ('o') THEN lower(trim(l_linestatus))
       ELSE 'unknown' END AS status_norm,
  {sql_dround('least(l_tax, l_discount)', 4)} AS bound_lo,
  {sql_dround('greatest(l_tax, l_discount)', 4)} AS bound_hi,
  CAST(epoch(l_shipdate) AS BIGINT) AS posted_epoch,
  l_orderkey * 86400 + 1000000000 AS epoch_roundtrip,
  CAST(NULL AS BIGINT) AS invalid_parse
FROM lineitem WHERE l_linenumber = 1
"""


# ---------------------------------------------------------------------------
# q17 — fuzzy similarity argmax join (J7): normalized levenshtein ratio
# ---------------------------------------------------------------------------
def q17_fuzzy_match(spark: SparkSession, sf: str) -> DataFrame:
    nation = table(spark, sf, "nation")
    region = table(spark, sf, "region")
    pairs = nation.crossJoin(F.broadcast(region))
    sim = (
        1
        - F.levenshtein(F.lower("n_name"), F.lower("r_name"))
        / F.greatest(F.length("n_name"), F.length("r_name"))
    ) * 100
    w = Window.partitionBy("n_name").orderBy(F.desc("sim"), F.asc("r_name"))
    return (
        pairs.withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("sim") >= 20))
        .select("n_name", F.col("r_name").alias("best_match"), dround(F.col("sim"), 2).alias("score"))
    )


_Q17_SQL = f"""
WITH scored AS (
  SELECT n_name, r_name,
    (1 - levenshtein(lower(n_name), lower(r_name))
         / greatest(length(n_name), length(r_name))) * 100 AS sim
  FROM nation CROSS JOIN region
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY n_name ORDER BY sim DESC, r_name ASC) AS rn
  FROM scored
)
SELECT n_name, r_name AS best_match, {sql_dround('sim', 2)} AS score
FROM ranked WHERE rn = 1 AND sim >= 20
"""


# ---------------------------------------------------------------------------
# q18 — dictionary skills extraction (U5): broadcast dictionary membership
# ---------------------------------------------------------------------------
_SKILL_DICT = [
    "spark", "hash", "join", "sort", "merge", "window",
    "stream", "vector", "query", "batch",
]


def q18_skills_extract(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    tokens = F.split(F.lower("text"), " ")
    dict_arr = F.array(*[F.lit(s) for s in _SKILL_DICT])
    skills = F.array_sort(F.array_intersect(tokens, dict_arr))
    # driver output contract: no array columns (the driver's pandas
    # canonicalizer cannot hash lists) — emit a '|'-joined string instead
    return docs.select(
        "doc_id",
        F.concat_ws("|", skills).alias("skills"),
        F.size(skills).cast("bigint").alias("n_skills"),
    )


_DICT_SQL = "[" + ", ".join(f"'{s}'" for s in _SKILL_DICT) + "]"
_Q18_SQL = f"""
SELECT doc_id,
  array_to_string(list_sort(list_distinct(list_filter(string_split(lower(text), ' '),
                                      x -> list_contains({_DICT_SQL}, x)))), '|') AS skills,
  len(list_distinct(list_filter(string_split(lower(text), ' '),
                                x -> list_contains({_DICT_SQL}, x)))) AS n_skills
FROM documents
"""


# ---------------------------------------------------------------------------
# q19 — weighted explainable ranking (U7) + top-k digest (O1)
# ---------------------------------------------------------------------------
def q19_rank_top25(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    df = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)

    # title-keyword subscore: matched/total (U7 title semantics)
    kw = (
        F.col("o_orderpriority").contains("URGENT").cast("int")
        + F.col("o_orderpriority").contains("HIGH").cast("int")
    )
    priority_score = kw / F.lit(2.0)
    # salary-band subscore: 1.0 in range, else max(0.1, 1 - dist/range)
    lo, hi = 50000.0, 150000.0
    rng = hi - lo
    price = F.col("o_totalprice")
    dist = F.when(price < lo, lo - price).otherwise(price - hi)
    price_score = F.when((price >= lo) & (price <= hi), F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.1), 1 - dist / F.lit(rng))
    )
    segment_score = F.when(F.col("c_mktsegment") == "BUILDING", 1.0).otherwise(0.3)
    status_score = (
        F.when(F.col("o_orderstatus") == "O", 1.0)
        .when(F.col("o_orderstatus") == "F", 0.3)
        .otherwise(0.5)
    )
    total = (
        0.4 * priority_score + 0.3 * price_score + 0.2 * segment_score + 0.1 * status_score
    ) * 100
    # reference: clamp(round(x, 2), 0, 100)
    rank_score = F.greatest(F.lit(0.0), F.least(F.lit(100.0), dround(total, 2)))
    scored = df.select(
        "o_orderkey",
        dround(priority_score, 6).alias("priority_score"),
        dround(price_score, 6).alias("price_score"),
        dround(segment_score, 6).alias("segment_score"),
        dround(status_score, 6).alias("status_score"),
        rank_score.alias("rank_score"),
    )
    return top_k(scored, [F.desc("rank_score"), F.asc("o_orderkey")], 25)


# NB: every numeric literal is ::DOUBLE so DuckDB does the same IEEE double
# arithmetic as Spark (bare 0.4 would be DECIMAL and round differently).
_Q19_SQL = f"""
WITH scored AS (
  SELECT o_orderkey,
    (CAST(position('URGENT' in o_orderpriority) > 0 AS INT)
     + CAST(position('HIGH' in o_orderpriority) > 0 AS INT)) / (2.0::DOUBLE) AS priority_score,
    CASE WHEN o_totalprice >= 50000.0::DOUBLE AND o_totalprice <= 150000.0::DOUBLE
         THEN 1.0::DOUBLE
         ELSE greatest(0.1::DOUBLE, 1.0::DOUBLE -
              (CASE WHEN o_totalprice < 50000.0::DOUBLE
                    THEN 50000.0::DOUBLE - o_totalprice
                    ELSE o_totalprice - 150000.0::DOUBLE END) / 100000.0::DOUBLE)
    END AS price_score,
    CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0::DOUBLE ELSE 0.3::DOUBLE END AS segment_score,
    CASE WHEN o_orderstatus = 'O' THEN 1.0::DOUBLE
         WHEN o_orderstatus = 'F' THEN 0.3::DOUBLE ELSE 0.5::DOUBLE END AS status_score
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT o_orderkey,
  {sql_dround('priority_score', 6)} AS priority_score,
  {sql_dround('price_score', 6)} AS price_score,
  {sql_dround('segment_score', 6)} AS segment_score,
  {sql_dround('status_score', 6)} AS status_score,
  greatest(0.0::DOUBLE, least(100.0::DOUBLE, {sql_dround(
      '(0.4::DOUBLE*priority_score + 0.3::DOUBLE*price_score'
      ' + 0.2::DOUBLE*segment_score + 0.1::DOUBLE*status_score)*100.0::DOUBLE', 2)}
  )) AS rank_score
FROM scored
ORDER BY rank_score DESC, o_orderkey ASC
LIMIT 25
"""


QUERIES: dict[str, Query] = {
    "q14_hash_identity": Query(q14_hash_identity, _Q14_SQL),
    "q15_seniority_cascade": Query(q15_seniority_cascade, _Q15_SQL),
    "q16_normalize_semantics": Query(q16_normalize_semantics, _Q16_SQL),
    "q17_fuzzy_match": Query(q17_fuzzy_match, _Q17_SQL),
    "q18_skills_extract": Query(q18_skills_extract, _Q18_SQL),
    "q19_rank_top25": Query(q19_rank_top25, _Q19_SQL),
}
