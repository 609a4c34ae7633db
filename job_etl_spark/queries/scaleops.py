"""Scale-path operators, tranche 2: warehouse + training-pipeline ops that
stress DISTRIBUTION correctness — global prefix sums without a single-
partition window, bloom-filter join pruning, SCD2 history builds, CDC
snapshot diffs, embedding covariance in one partial aggregate, mixture
sampling, and the keep-canonical last mile of near-dup dedup.

Same parity rules as the rest of the inventory (queries._util): exact
DECIMAL arithmetic for double aggregates, epoch-µs BIGINTs for instants,
md5-derived hashing only (engine-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from job_etl_spark.queries._util import Query, dround, dsum, sql_dround, sql_dsum
from job_etl_spark.tables import parallel_scan, parallel_table, table


# ---------------------------------------------------------------------------
# q87 — embedding covariance (first 8 dims): the moment-matrix shape that
# feeds whitening / PCA at corpus scale. ONE partial+final aggregate
# computes every Σx_i and Σx_i·x_j — a 100 TB corpus reduces to 45 numbers
# with zero extra shuffles (map-side combine does almost all the work).
# Covariances derive from the sums in a post-agg projection.
# ---------------------------------------------------------------------------
_COV_DIMS = 8


def q87_embedding_covariance(spark: SparkSession, sf: str) -> DataFrame:
    # the 90 projection/aggregate/output expressions are rendered as SQL
    # text and applied via three selectExpr calls (the exact fragments the
    # DuckDB twin uses, modulo element_at for Spark's 0-based []): per-
    # Column construction was ~1.1 s of py4j round trips per bench run —
    # most of the query's wall-clock at sf0.1
    emb = parallel_table(spark, sf, "embeddings")
    xs = [
        f"CAST(element_at(embedding, {i + 1}) AS DOUBLE) AS x{i}"
        for i in range(_COV_DIMS)
    ]
    sums = ["COUNT(*) AS n"]
    for i in range(_COV_DIMS):
        sums.append(f"CAST(SUM(CAST(x{i} AS DECIMAL(30,6))) AS DOUBLE) AS sx{i}")
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            sums.append(
                f"CAST(SUM(CAST(x{i} * x{j} AS DECIMAL(30,6))) AS DOUBLE) AS sxy{i}_{j}"
            )
    outs = ["n AS n_rows"]
    for i in range(_COV_DIMS):
        outs.append(f"{sql_dround(f'sx{i} / n', 6)} AS mean_{i}")
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            outs.append(
                f"{sql_dround(f'(sxy{i}_{j} - sx{i} * sx{j} / n) / n', 6)} AS cov_{i}_{j}"
            )
    return emb.selectExpr(*xs).selectExpr(*sums).selectExpr(*outs)


def _q87_sql() -> str:
    xs = ",\n    ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}" for i in range(_COV_DIMS)
    )
    sums = ["COUNT(*) AS n"]
    for i in range(_COV_DIMS):
        sums.append(f"CAST(SUM(CAST(x{i} AS DECIMAL(30,6))) AS DOUBLE) AS sx{i}")
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            sums.append(
                f"CAST(SUM(CAST(x{i} * x{j} AS DECIMAL(30,6))) AS DOUBLE) AS sxy{i}_{j}"
            )
    outs = ["n AS n_rows"]
    for i in range(_COV_DIMS):
        outs.append(f"{sql_dround(f'sx{i} / n', 6)} AS mean_{i}")
    for i in range(_COV_DIMS):
        for j in range(i, _COV_DIMS):
            outs.append(
                f"{sql_dround(f'(sxy{i}_{j} - sx{i} * sx{j} / n) / n', 6)} AS cov_{i}_{j}"
            )
    return (
        "WITH x AS (\n  SELECT " + xs + "\n  FROM embeddings\n), s AS (\n  SELECT "
        + ",\n    ".join(sums)
        + "\n  FROM x\n)\nSELECT "
        + ",\n  ".join(outs)
        + "\nFROM s"
    )


# ---------------------------------------------------------------------------
# q88 — near-dup dedup, keep-canonical: the LAST MILE that near-dup
# pipelines actually ship — pairs (q31 simhash) → clusters (ml/cluster CC)
# → keep each cluster's minimum doc_id, drop the rest; report the retention
# per (lang, source). cluster_id from CC IS the component minimum, so
# "kept" is the zero-cost predicate doc_id == coalesce(cluster_id, doc_id).
# ---------------------------------------------------------------------------
def q88_dedup_keep_canonical(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.ml.cluster import connected_components
    from job_etl_spark.queries.lifedata import q31_simhash_neardup

    pairs = q31_simhash_neardup(spark, sf).select("doc_a", "doc_b")
    cc = connected_components(pairs)  # (node, cluster_id = component min)
    docs = table(spark, sf, "documents").select("doc_id", "lang", "source")
    lab = docs.join(cc, docs.doc_id == cc.node, "left")
    kept = F.coalesce(F.col("cluster_id"), F.col("doc_id")) == F.col("doc_id")
    return lab.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.count(F.when(~kept, 1)).alias("n_dropped"),
    )


def _q88_sql() -> str:
    from job_etl_spark.queries.lifedata import _Q31_SQL

    prefix = _Q31_SQL.replace("WITH tok AS (", "WITH RECURSIVE tok AS (", 1).replace(
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,",
        ", pairs AS (\nSELECT a.doc_id AS doc_a, b.doc_id AS doc_b,",
    )
    return (
        prefix
        + """
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), labeled AS (
  SELECT a AS node, MIN(b) AS cluster_id FROM reach GROUP BY a
)
SELECT d.lang, d.source,
  COUNT(*) AS n_docs,
  COUNT(CASE WHEN l.cluster_id IS NULL OR l.cluster_id = d.doc_id THEN 1 END) AS n_kept,
  COUNT(CASE WHEN l.cluster_id IS NOT NULL AND l.cluster_id <> d.doc_id THEN 1 END) AS n_dropped
FROM documents d LEFT JOIN labeled l ON d.doc_id = l.node
GROUP BY d.lang, d.source
"""
    )


# ---------------------------------------------------------------------------
# q89 — SCD2 history build (type-2 slowly changing dimension): collapse
# each user's event stream into validity intervals per event_type run —
# gaps-and-islands (lag → island flag → running island id), then one
# aggregate per island and a lead() for valid_to. Everything is keyed on
# user_id: two window passes + one aggregate, all on the same shuffle key,
# no global ordering anywhere.
# ---------------------------------------------------------------------------
def q89_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = ev.withColumn(
        "new_island", F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    )
    islands = flagged.withColumn("version", F.sum("new_island").over(w).cast("int"))
    g = islands.groupBy("user_id", "version").agg(
        F.max("event_type").alias("event_type"),  # constant within an island
        F.min("ts_us").alias("valid_from_us"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from_us").over(w2)
    return g.select(
        "user_id",
        "version",
        "event_type",
        "valid_from_us",
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


_Q89_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
), fl AS (
  SELECT *,
    CASE WHEN lag(event_type) OVER w IS NULL
           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS new_island
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), isl AS (
  SELECT *, CAST(SUM(new_island) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id) AS INT) AS version
  FROM fl
), g AS (
  SELECT user_id, version, MAX(event_type) AS event_type,
         MIN(ts_us) AS valid_from_us
  FROM isl GROUP BY user_id, version
)
SELECT user_id, version, event_type, valid_from_us,
  lead(valid_from_us) OVER w2 AS valid_to_us,
  (lead(valid_from_us) OVER w2 IS NULL) AS is_current
FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
"""


# ---------------------------------------------------------------------------
# q90 — temperature-weighted source mixture sampling: the data-mixing step
# of corpus assembly. Per-source weight ∝ n^0.5 (temperature flattening),
# target sample 50% of the corpus re-balanced to those weights; membership
# is the md5-bucket rule (RNG-free, partition/run/engine stable — same
# design as the q59 split). Shuffles: one per-source agg (tiny) broadcast
# back; the corpus pass is map-only.
# ---------------------------------------------------------------------------
def q90_source_mixture(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.ml.dedup import hexint

    docs = table(spark, sf, "documents").select("doc_id", "source")
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    wall = Window.partitionBy()  # post-agg frame: one row per source (bounded)
    wr = F.sqrt(F.col("n_docs").cast("double"))
    stats = stats.withColumn(
        "weight",
        dround(
            wr / F.sum(wr.cast("decimal(30,6)")).over(wall).cast("double"), 6
        ),
    ).withColumn(
        "thr",
        F.floor(
            F.least(
                F.lit(1.0),
                F.col("weight")
                * F.sum("n_docs").over(wall).cast("double")
                * 0.5
                / F.col("n_docs").cast("double"),
            )
            * 1_000_000
        ).cast("bigint"),
    )
    tagged = docs.join(F.broadcast(stats), "source")
    sampled = F.count(
        F.when(hexint(F.col("doc_id").cast("string")) % 1_000_000 < F.col("thr"), 1)
    )
    return tagged.groupBy("source", "n_docs", "weight").agg(
        sampled.alias("n_sampled")
    )


def _q90_sql() -> str:
    from job_etl_spark.queries.lifedata import _SQL_HEXINT

    h = _SQL_HEXINT.format(expr="CAST(d.doc_id AS VARCHAR)")
    return f"""
WITH s AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), w AS (
  SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS wr FROM s
), t AS (
  SELECT source, n_docs,
    {sql_dround('wr / (SELECT CAST(SUM(CAST(wr AS DECIMAL(30,6))) AS DOUBLE) FROM w)', 6)} AS weight
  FROM w
), r AS (
  SELECT source, n_docs, weight,
    CAST(floor(least(1.0,
      weight * (SELECT CAST(SUM(n_docs) AS DOUBLE) FROM s) * 0.5
        / CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS thr
  FROM t
)
SELECT r.source, r.n_docs, r.weight,
  COUNT(CASE WHEN {h} % 1000000 < r.thr THEN 1 END) AS n_sampled
FROM documents d JOIN r ON d.source = r.source
GROUP BY r.source, r.n_docs, r.weight
"""


# ---------------------------------------------------------------------------
# q91 — chunk-level dedup with document reassembly (CCNet-style boilerplate
# removal at sub-document granularity): 4-token chunks, global first-
# occurrence wins (row_number over the content hash, ordered by doc/pos),
# surviving chunks are stitched back per doc in position order. The only
# shuffles are the hash window and the doc re-agg — no doc×doc pass.
# ---------------------------------------------------------------------------
_Q91_CHUNK = 4


def q91_chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.functions.chunking import chunks_expr, tokens_expr

    docs = parallel_table(spark, sf, "documents")
    ch = docs.select(
        "doc_id", F.explode(chunks_expr(tokens_expr("text"), _Q91_CHUNK)).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
    w = Window.partitionBy(F.md5("chunk_text")).orderBy("doc_id", "chunk_idx")
    flagged = ch.withColumn("keep", F.row_number().over(w) == 1)
    kept_struct = F.when(
        F.col("keep"), F.struct("chunk_idx", "chunk_text")
    )  # NULL (dropped by collect_list) when not kept
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x.chunk_text,
                ),
                " ",
            )
        ).alias("kept_md5"),
    )


_Q91_SQL = f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), c AS (
  SELECT doc_id, CAST(w AS INT) AS chunk_idx,
    array_to_string(toks[w * {_Q91_CHUNK} + 1 : w * {_Q91_CHUNK} + {_Q91_CHUNK}], ' ') AS chunk_text
  FROM t, LATERAL (
    SELECT unnest(range(0, CAST(ceil(len(toks) / {_Q91_CHUNK}.0) AS BIGINT))) AS w
  ) u
  WHERE len(toks) > 0
), f AS (
  SELECT *, row_number() OVER (
    PARTITION BY md5(chunk_text) ORDER BY doc_id, chunk_idx) = 1 AS keep
  FROM c
)
SELECT doc_id, COUNT(*) AS n_chunks,
  COUNT(CASE WHEN keep THEN 1 END) AS n_kept,
  md5(COALESCE(string_agg(CASE WHEN keep THEN chunk_text END, ' ' ORDER BY chunk_idx), '')) AS kept_md5
FROM f GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q92 — bloom-filter join pruning (operators/bloom.py): lineitem rows are
# prefiltered by an 8 KiB bitmap built from the urgent-order keys BEFORE
# the exact semi-join — at 100 TB the probe side entering the shuffle
# shrinks by the filter's selectivity while the bitmap ships as a plan
# literal. No false negatives ⇒ result ≡ the plain semi-join the oracle
# runs; the equivalence IS the correctness claim.
# ---------------------------------------------------------------------------
def q92_bloom_prejoin(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.operators.bloom import bloom_semi_join

    urgent = (
        table(spark, sf, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = parallel_table(spark, sf, "lineitem")  # md5 probe wants full cores
    pruned = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return pruned.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_extendedprice")).alias("revenue"),
    )


_Q92_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_items,
  {sql_dsum("l_extendedprice")} AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q93 — token-budget shard assignment (training-shard manifest): documents
# in doc_id order are cut into shards of ~2000 tokens by a GLOBAL running
# total — computed with operators/prefix.py's bucketed prefix sum (two
# bounded shuffles, no single-partition window; the naive SUM() OVER
# (ORDER BY) the oracle runs is exactly the shape that does NOT scale).
# ---------------------------------------------------------------------------
_Q93_BUDGET = 2000


def q93_token_budget_shards(spark: SparkSession, sf: str) -> DataFrame:
    from job_etl_spark.functions.chunking import tokens_expr
    from job_etl_spark.operators.prefix import running_total

    docs = (
        table(spark, sf, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", F.size(tokens_expr("text")).cast("bigint").alias("n_tokens"))
        .where(F.col("n_tokens") > 0)
    )
    rt = running_total(docs, "doc_id", "n_tokens", "cum_tokens")
    shard = F.floor((F.col("cum_tokens") - 1) / F.lit(float(_Q93_BUDGET))).cast("bigint")
    return (
        rt.withColumn("shard_id", shard)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


_Q93_SQL = f"""
WITH t AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
      x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL
), c AS (
  SELECT doc_id, n_tokens,
    SUM(n_tokens) OVER (ORDER BY doc_id) AS cum_tokens
  FROM t WHERE n_tokens > 0
)
SELECT CAST(floor((cum_tokens - 1) / {_Q93_BUDGET}.0) AS BIGINT) AS shard_id,
  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q94 — CDC snapshot diff (transition matrix): the per-user latest state
# (argmax by ts via row_number) at two watermark cuts, full-outer-joined on
# the key and bucketed into (old_state, new_state) counts. Cuts derive
# from a bounded 1-row min/max aggregate (embedded as literals — same
# pattern as q48's centroids) so the filters stay pushdown-friendly.
# ---------------------------------------------------------------------------
def q94_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    b = ev.agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")).first()
    lo, hi = int(b["lo"]), int(b["hi"])
    cut_a = lo + (hi - lo) * 2 // 5
    cut_b = lo + (hi - lo) * 7 // 10

    def state_at(cut_us: int, out: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        return (
            ev.where(F.col("ts_us") <= F.lit(cut_us))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias(out))
        )

    old = state_at(cut_a, "old_state")
    new = state_at(cut_b, "new_state")
    j = old.join(new, "user_id", "full")
    return j.groupBy(
        F.coalesce("old_state", F.lit("none")).alias("old_type"),
        F.coalesce("new_state", F.lit("none")).alias("new_type"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


_Q94_SQL = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
), olds AS (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type, row_number() OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
    FROM events
    WHERE epoch_us(ts) <= (SELECT lo + (hi - lo) * 2 // 5 FROM b)
  ) WHERE rn = 1
), news AS (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type, row_number() OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
    FROM events
    WHERE epoch_us(ts) <= (SELECT lo + (hi - lo) * 7 // 10 FROM b)
  ) WHERE rn = 1
)
SELECT COALESCE(o.event_type, 'none') AS old_type,
       COALESCE(n.event_type, 'none') AS new_type,
       COUNT(*) AS n_users
FROM olds o FULL JOIN news n ON o.user_id = n.user_id
GROUP BY 1, 2
"""


QUERIES: dict[str, Query] = {
    "q87_embedding_covariance": Query(q87_embedding_covariance, _q87_sql()),
    "q88_dedup_keep_canonical": Query(q88_dedup_keep_canonical, _q88_sql()),
    "q89_scd2_history": Query(q89_scd2_history, _Q89_SQL),
    "q90_source_mixture": Query(q90_source_mixture, _q90_sql()),
    "q91_chunk_dedup": Query(q91_chunk_dedup, _Q91_SQL),
    "q92_bloom_prejoin": Query(q92_bloom_prejoin, _Q92_SQL),
    "q93_token_budget_shards": Query(q93_token_budget_shards, _Q93_SQL),
    "q94_snapshot_diff": Query(q94_snapshot_diff, _Q94_SQL),
}
