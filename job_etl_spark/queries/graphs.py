"""Graph-analytics tranche: structural analysis of the near-dup pair
graph (q31's simhash edges). Dedup pipelines emit PAIRS; beyond
clustering them (q58), a data-curation team audits the pair graph's
SHAPE — a high clustering coefficient means near-dup sets are dense
blobs (safe to collapse to one canonical doc), a low one means chains
of borderline matches (collapsing over-merges); PageRank-style
centrality surfaces the "template" documents whose boilerplate links
hundreds of others.

Scale shapes (the 100 TB contract):
- Triangle counting is the standard edge-iterator: two equi-joins on
  node ids over the (already band-bounded) edge list — never touches
  the corpus pairwise. Edge lists are the near-dup ACTIVE SET, orders
  of magnitude smaller than the corpus.
- PageRank is K fixed joined iterations (contribution join + sum keyed
  on node id) — the classic Pregel loop expressed as DataFrame ops; no
  driver materialization beyond the bounded N scalar.

Cross-engine parity: per-edge contribution division happens in IEEE
double (deterministic), every SUM goes through exact DECIMAL, and each
iteration re-rounds ranks at 12 decimals so both engines iterate on
bit-identical state (the queries._util discipline).

Reference tie-in: the reference has no graph operators — this extends
its dedup surface (services/normalizer/hash_generator.py exact-dup
identity) to the transitive near-dup structure a corpus-scale pipeline
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_etl_spark.queries._util import Query
from job_etl_spark.tables import table

QUERIES: dict[str, Query] = {}


def _r12(c: F.Column) -> F.Column:
    """Engine-exact 12-decimal rounding of a double (decimal(26,16)
    holds any |x| < 10^10 without overflow — ranks are ≤ 1)."""
    return F.round(c.cast("decimal(26,16)"), 12).cast("double")


def _sql_r12(expr: str) -> str:
    return f"CAST(ROUND(CAST({expr} AS DECIMAL(26,16)), 12) AS DOUBLE)"


def _edges(spark: SparkSession, sf: str) -> DataFrame:
    """The near-dup pair graph: q31's simhash pairs as (doc_a < doc_b).

    Lazily checkpointed: every graph query reads the edge list more than
    once (triangle census self-joins it 3×, PageRank reads it per power
    iteration), and without materialization each read re-runs the whole
    simhash signature + pair-expansion pipeline."""
    from job_etl_spark.queries.lifedata import q31_simhash_neardup

    return (
        q31_simhash_neardup(spark, sf)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )


def _edges_sql() -> str:
    from job_etl_spark.queries.lifedata import _Q31_SQL

    return f"SELECT doc_a, doc_b FROM ({_Q31_SQL})"


# ---------------------------------------------------------------------------
# q147 — triangle census + global clustering coefficient.
#
# Edge-iterator triangle counting: with every edge stored once as
# (a < b), a triangle a<b<c is exactly one (a,b)+(b,c) path closed by
# (a,c) — two equi-joins on node ids, each shuffle keyed on a node id
# (skew on template-hub nodes is AQE's skew-join case). Wedges (open
# triads) come from the degree distribution alone: Σ deg·(deg−1)/2.
# Global clustering coefficient = 3·triangles / wedges.
#
# The scalar aggregates meet in a 1-row × 1-row cross (bounded by
# construction — the q51/q57 scalar pattern, whitelisted in the plan
# guard).
# ---------------------------------------------------------------------------
def q147_triangle_census(spark: SparkSession, sf: str) -> DataFrame:
    e = _edges(spark, sf)
    paths = e.alias("e1").join(
        e.alias("e2"), F.col("e1.doc_b") == F.col("e2.doc_a")
    ).select(
        F.col("e1.doc_a").alias("a"),
        F.col("e1.doc_b").alias("b"),
        F.col("e2.doc_b").alias("c"),
    )
    tri = paths.join(
        e.alias("e3"),
        (F.col("a") == F.col("e3.doc_a")) & (F.col("c") == F.col("e3.doc_b")),
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    ends = e.select(F.col("doc_a").alias("doc_id")).unionAll(
        e.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("deg"))
    # edge count and wedge count both fall out of the degree frame in ONE
    # aggregation (Σdeg = 2·|E|); the only scalar combine left is a 1-row ×
    # 1-row join with the triangle count (bounded by construction)
    ew = deg.agg(
        (F.sum("deg") / 2).cast("bigint").alias("n_edges"),
        F.sum((F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint")).alias(
            "n_wedges"
        ),
    )
    out = ew.crossJoin(F.broadcast(tri))
    # IEEE-double division then decimal-round: a decimal÷bigint division
    # rounds the exact rational in Spark but falls to DOUBLE in DuckDB —
    # an exact .5 at the round digit would flip between engines
    coeff = F.when(
        F.col("n_wedges") > 0,
        F.round(
            (
                (F.lit(3) * F.col("n_triangles")).cast("double")
                / F.col("n_wedges")
            ).cast("decimal(24,10)"),
            8,
        ).cast("double"),
    )
    return out.select(
        "n_edges", "n_triangles", "n_wedges", coeff.alias("clustering_coeff")
    )


def _q147_sql() -> str:
    return f"""
WITH e AS ({_edges_sql()}),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e1.doc_b = e2.doc_a
  JOIN e e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
),
deg AS (
  SELECT doc_id, COUNT(*) AS deg FROM (
    SELECT doc_a AS doc_id FROM e UNION ALL SELECT doc_b FROM e
  ) GROUP BY doc_id
),
wed AS (SELECT CAST(SUM(CAST(deg * (deg - 1) / 2 AS BIGINT)) AS BIGINT) AS n_wedges FROM deg),
ne AS (SELECT COUNT(*) AS n_edges FROM e)
SELECT ne.n_edges, tri.n_triangles, wed.n_wedges,
  CASE WHEN wed.n_wedges > 0 THEN
    CAST(ROUND(CAST(CAST(3 * tri.n_triangles AS DOUBLE) / wed.n_wedges
      AS DECIMAL(24,10)), 8) AS DOUBLE)
  END AS clustering_coeff
FROM ne, tri, wed
"""


# ---------------------------------------------------------------------------
# q148 — PageRank centrality (damping 0.85, 3 fixed iterations) over the
# symmetric near-dup graph; nodes are ALL documents (isolated docs hold
# the teleport floor). Surfaces template/boilerplate hub documents.
#
# Each iteration: contribution join (rank(u)/deg(u) shipped along each
# edge, shuffle keyed on u) → exact-decimal sum keyed on v → left join
# back to the full node set. Fixed K and per-iteration 12-decimal
# re-rounding make the result engine-exact (the oracle unrolls the same
# three iterations as CTEs); dangling-node mass is dropped (teleport
# only), the standard simplified formulation.
# ---------------------------------------------------------------------------
_PR_ITERS = 3
_PR_DAMP = 0.85
_PR_TOP = 20


def q148_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    e = _edges(spark, sf)
    # The edge list derives from the whole simhash near-dup pipeline; it
    # (and the degree table) is read in EVERY power iteration, so
    # materialize both once — without the checkpoint each iteration
    # re-runs signature computation + pair expansion. checkpoint() to
    # durable storage at cluster scale (ml/cluster.py's pattern).
    sym = e.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionAll(e.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    sym = sym.localCheckpoint(eager=False)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=False
    )
    docs = table(spark, sf, "documents").select("doc_id")
    n = docs.count()  # bounded scalar (oracle recomputes in SQL)
    # literal 0.15, matching the SQL twin's CAST(0.15 AS DOUBLE) — the
    # algebraic form (1.0 - 0.85) evaluates to 0.15000000000000002, a
    # 1-ulp mismatch injected into every rank before the re-round
    teleport = 0.15 / n
    ranks = docs.select("doc_id", _r12(F.lit(1.0 / n)).alias("rank"))
    for _ in range(_PR_ITERS):
        contribs = (
            sym.join(ranks, sym.u == ranks.doc_id)
            .join(deg, "u")
            .select(
                F.col("v").alias("doc_id"),
                _r12(F.col("rank") / F.col("deg")).alias("contrib"),
            )
        )
        sums = contribs.groupBy("doc_id").agg(
            F.sum(F.col("contrib").cast("decimal(30,12)")).alias("s")
        )
        ranks = docs.join(sums, "doc_id", "left").select(
            "doc_id",
            _r12(
                F.lit(teleport)
                + F.lit(_PR_DAMP)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
        # NO per-iteration checkpoint (r12): K is FIXED at 3, so the
        # unrolled lineage is bounded (3 join+agg blocks over the two
        # checkpointed frames) and safe to plan as ONE action — the lazy
        # per-iteration checkpoints serialized materialization into a
        # cascade of tiny jobs whose driver-side gaps dominated the query
        # (~3.5 s of gaps across 22 jobs in the r12 profile; guide §2.1
        # "stragglers you can't see in the plan"). An unbounded-K loop
        # would need the checkpoint back (classic iterative plan blow-up).
    return ranks.orderBy(F.desc("rank"), "doc_id").limit(_PR_TOP)


def _q148_sql() -> str:
    it = """
it{i} AS (
  SELECT d.doc_id,
    {rank} AS rank
  FROM documents d
  LEFT JOIN (
    SELECT s.v AS doc_id,
      SUM(CAST({contrib} AS DECIMAL(30,12))) AS s
    FROM sym s
    JOIN it{prev} r ON s.u = r.doc_id
    JOIN deg g ON s.u = g.u
    GROUP BY s.v
  ) agg ON d.doc_id = agg.doc_id
)"""
    contrib = _sql_r12("r.rank / g.deg")
    rank = _sql_r12(
        "CAST(0.15 AS DOUBLE) / (SELECT c FROM n) "
        "+ CAST(0.85 AS DOUBLE) * COALESCE(CAST(agg.s AS DOUBLE), 0.0)"
    )
    iters = ",".join(
        it.format(i=i, prev=i - 1, contrib=contrib, rank=rank)
        for i in range(1, _PR_ITERS + 1)
    )
    r0 = _sql_r12("CAST(1.0 AS DOUBLE) / (SELECT c FROM n)")
    return f"""
WITH e AS ({_edges_sql()}),
sym AS (
  SELECT doc_a AS u, doc_b AS v FROM e
  UNION ALL SELECT doc_b, doc_a FROM e
),
deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
n AS (SELECT COUNT(*) AS c FROM documents),
it0 AS (SELECT doc_id, {r0} AS rank FROM documents),
{iters}
SELECT doc_id, rank FROM it{_PR_ITERS}
ORDER BY rank DESC, doc_id LIMIT {_PR_TOP}
"""


QUERIES.update(
    {
        "q147_triangle_census": Query(q147_triangle_census, _q147_sql()),
        "q148_pagerank": Query(q148_pagerank, _q148_sql()),
    }
)
