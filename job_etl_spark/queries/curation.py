"""Corpus-curation tranche 4: the remaining heavy-lift operators of a
training-data pipeline — exact duplicate-span detection (the fixed-length
approximation of suffix-array substring dedup), product-quantization
encoding (the storage layer of 100 TB ANN), and train/test distribution
drift checks.

Same parity rules as the rest of the inventory (queries._util): exact
DECIMAL arithmetic wherever doubles are aggregated, md5-derived hashing
only (engine-stable), per-row double arithmetic in fixed fold order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_etl_spark.functions.chunking import tokens_expr
from job_etl_spark.ml.dedup import hexint
from job_etl_spark.queries._util import Query, dround
from job_etl_spark.tables import parallel_table, table

_SQL_HEXINT = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# q111 — exact duplicate-span detection: the fixed-n approximation of
# suffix-array substring dedup (Lee et al., "Deduplicating Training Data
# Makes Language Models Better" — their ExactSubstr with a fixed window).
# Every overlapping 8-token span is hashed to a 60-bit int; a span that
# occurs ≥2 times anywhere in the corpus (cross- OR within-doc) marks its
# occurrences as duplicated text. Per-doc output feeds the span-removal /
# doc-drop policy downstream.
#
# Scale shape: explode → groupBy(span_hash) WITH map-side combine (a viral
# boilerplate span collapses to partial counts before the shuffle) → join
# back on the same key (exchange reuse; AQE skew-split handles hot
# hashes) → per-doc aggregate keyed on doc_id. Shuffled payload is
# (doc_id, bigint) — ~16 bytes/span; no strings cross the wire.
# ---------------------------------------------------------------------------
_SPAN = 8


def q111_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    docs = parallel_table(spark, sf, "documents")
    toks = tokens_expr("text")
    n_spans = F.size(toks) - F.lit(_SPAN - 1)
    arr = F.when(
        n_spans > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_spans, F.lit(1))),
            lambda i: hexint(F.concat_ws(" ", F.slice(toks, i, _SPAN))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    spans = docs.select("doc_id", F.explode(arr).alias("h"))
    occ = spans.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = (
        spans.join(occ, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count(F.when(F.col("n_occ") >= 2, 1)).alias("n_dup_spans"),
        )
    )
    return (
        docs.select("doc_id", "lang")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce(
                dround(F.col("n_dup_spans") / F.col("n_spans"), 6), F.lit(0.0)
            ).alias("dup_ratio"),
        )
    )


_Q111_SQL = f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), s AS (
  SELECT doc_id,
    {_SQL_HEXINT.format(expr=f"array_to_string(toks[i:i+{_SPAN - 1}], ' ')")} AS h
  FROM t, LATERAL (
    SELECT unnest(range(1, greatest(len(toks) - {_SPAN - 2}, 1))) AS i
  ) u
  WHERE len(toks) >= {_SPAN}
), occ AS (
  SELECT h, COUNT(*) AS n_occ FROM s GROUP BY h
), per_doc AS (
  SELECT s.doc_id, COUNT(*) AS n_spans,
    COUNT(CASE WHEN occ.n_occ >= 2 THEN 1 END) AS n_dup_spans
  FROM s JOIN occ USING (h) GROUP BY s.doc_id
)
SELECT d.doc_id, d.lang,
  COALESCE(p.n_spans, 0) AS n_spans,
  COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
  COALESCE({{dr}}, 0.0) AS dup_ratio
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""".replace(
    "{dr}",
    "CAST(ROUND(CAST(p.n_dup_spans / p.n_spans AS DECIMAL(24,10)), 6) AS DOUBLE)",
)


# ---------------------------------------------------------------------------
# q112 — product-quantization encode: 64 floats → 4 one-byte codes (the
# 32× compression that makes billion-vector ANN fit in RAM; Jégou et al.,
# "Product Quantization for Nearest Neighbor Search"). The vector is cut
# into M=4 subspaces of 16 dims; each sub-vector maps to its nearest
# sub-centroid (L2, ties to the smallest code id) from a deterministic
# codebook (the K=16 smallest-vec_id vectors, like q48/q110 — swap k-means
# codebooks in at deployment; the operator only needs SOME fixed book).
#
# Scale shape: the codebook is a bounded collect folded into plan
# LITERALS, so encode is a pure map — no join, no shuffle — followed by
# ONE stats aggregate. argmin-by-L2 is rewritten argmax of
# (dot(a,c) − ½·|c|²): |a|² is common to every candidate, so the ranking
# needs only the dot products; distortion |a−c|² is reconstructed from the
# same terms. All per-row double math in fixed fold order; the 4 per-
# subspace distortion terms cross into DECIMAL before any summation.
# ---------------------------------------------------------------------------
_PQ_M = 4  # subspaces
_PQ_D = 16  # dims per subspace
_PQ_K = 16  # codes per subspace


def _py_sumsq(vec: list[float]) -> float:
    # same left-to-right IEEE fold as list_dot_product(v, v) / the Spark
    # aggregate, so the literal is bit-identical in both engines
    s = 0.0
    for x in vec:
        s += x * x
    return s


def q112_pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    emb = parallel_table(spark, sf, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )
    book = [
        list(r["vec"])
        for r in emb.select("vec_id", "vec").orderBy("vec_id").limit(_PQ_K).collect()
    ]
    if not book:
        raise ValueError("q112_pq_codes: empty corpus — no codebook")

    def _sub(vec_col, m: int):
        return F.slice(vec_col, m * _PQ_D + 1, _PQ_D)

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )

    codes, terms = [], []
    for m in range(_PQ_M):
        a_m = _sub(F.col("vec"), m)
        a2 = F.aggregate(
            F.transform(a_m, lambda x: x * x), F.lit(0.0), lambda s, x: s + x
        )
        cands = F.array(
            *[
                F.struct(
                    (
                        _dot(
                            a_m,
                            F.array(
                                *[F.lit(x) for x in cvec[m * _PQ_D : (m + 1) * _PQ_D]]
                            ),
                        )
                        - F.lit(0.5 * _py_sumsq(cvec[m * _PQ_D : (m + 1) * _PQ_D]))
                    ).alias("s"),
                    F.lit(-cid).alias("n"),
                    F.lit(_py_sumsq(cvec[m * _PQ_D : (m + 1) * _PQ_D])).alias("cn2"),
                )
                for cid, cvec in enumerate(book)
            ]
        )
        best = F.array_max(cands)
        codes.append((-best.getField("n")).cast("int").alias(f"code_{m}"))
        # |a−c|² = |a|² − 2·(dot − ½|c|²) — reuses the ranking score exactly
        terms.append(
            (a2 - 2.0 * best.getField("s")).cast("decimal(30,12)").alias(f"term_{m}")
        )
    enc = emb.select("vec_id", "label", *codes, *terms)
    code_str = F.concat_ws(",", *[F.col(f"code_{m}") for m in range(_PQ_M)])
    dist = sum(F.col(f"term_{m}") for m in range(1, _PQ_M)) + F.col("term_0")
    pervec = enc.select("label", code_str.alias("code_str"), dist.alias("dist"))
    return pervec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.countDistinct("code_str").alias("n_distinct_codes"),
        F.round(F.sum("dist") / F.count(F.lit(1)), 6)
        .cast("double")
        .alias("avg_distortion"),
    )


def _q112_sql() -> str:
    lo, hi = "u.m * {d} + 1".format(d=_PQ_D), "u.m * {d} + {d}".format(d=_PQ_D)
    return f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
), cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c_id, vec AS c_vec
  FROM e ORDER BY vec_id LIMIT {_PQ_K}
), scored AS (
  SELECT e.vec_id, e.label, u.m, cb.c_id,
    list_dot_product(e.vec[{lo}:{hi}], cb.c_vec[{lo}:{hi}]) AS dot,
    list_dot_product(cb.c_vec[{lo}:{hi}], cb.c_vec[{lo}:{hi}]) AS cn2,
    list_dot_product(e.vec[{lo}:{hi}], e.vec[{lo}:{hi}]) AS a2
  FROM e CROSS JOIN cb CROSS JOIN (SELECT unnest(range(0, {_PQ_M})) AS m) u
), best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, m ORDER BY dot - 0.5 * cn2 DESC, c_id) AS rn
    FROM scored) WHERE rn = 1
), pervec AS (
  SELECT vec_id, label,
    string_agg(CAST(c_id AS VARCHAR), ',' ORDER BY m) AS code_str,
    SUM(CAST(a2 - 2 * (dot - 0.5 * cn2) AS DECIMAL(30,12))) AS dist
  FROM best GROUP BY vec_id, label
)
SELECT label, COUNT(*) AS n_vecs,
  COUNT(DISTINCT code_str) AS n_distinct_codes,
  CAST(ROUND(SUM(dist) / COUNT(*), 6) AS DOUBLE) AS avg_distortion
FROM pervec GROUP BY label
"""


# ---------------------------------------------------------------------------
# q113 — split drift check: after the deterministic train/val/test
# assignment (q59's md5 bucket), verify the test split is distributionally
# representative — per lang, a symmetrized chi-square statistic between
# the train and test SOURCE mixtures. The pipeline QA gate that catches a
# split key accidentally correlated with a data property.
#
# Scale shape: one partial-agg groupBy over the corpus → per-lang totals
# (broadcast-sized) joined back → per-lang sum of a handful of per-source
# terms. Output rows = langs. Ratios are per-row double math; the final
# per-lang sum crosses into DECIMAL.
# ---------------------------------------------------------------------------
def q113_split_drift(spark: SparkSession, sf: str) -> DataFrame:
    docs = table(spark, sf, "documents")
    bucket = hexint(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    counts = (
        docs.select(split.alias("split"), "lang", "source")
        .where(F.col("split") != "val")
        .groupBy("lang", "source")
        .agg(
            F.count(F.when(F.col("split") == "train", 1)).alias("n_tr"),
            F.count(F.when(F.col("split") == "test", 1)).alias("n_te"),
        )
    )
    totals = counts.groupBy("lang").agg(
        F.sum("n_tr").alias("tot_tr"), F.sum("n_te").alias("tot_te")
    )
    p_tr = F.col("n_tr") / F.col("tot_tr")
    p_te = F.col("n_te") / F.col("tot_te")
    term = F.when(
        (F.col("tot_tr") > 0) & (F.col("tot_te") > 0) & (F.col("n_tr") + F.col("n_te") > 0),
        (p_tr - p_te) * (p_tr - p_te) / (p_tr + p_te),
    )
    return (
        counts.join(F.broadcast(totals), "lang")
        .groupBy("lang")
        .agg(
            F.max("tot_tr").alias("n_train"),
            F.max("tot_te").alias("n_test"),
            F.round(F.sum(term.cast("decimal(30,12)")), 6)
            .cast("double")
            .alias("drift"),
        )
    )


_Q113_SQL = f"""
WITH s AS (
  SELECT lang, source,
    CASE WHEN {_SQL_HEXINT.format(expr="CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
         WHEN {_SQL_HEXINT.format(expr="CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
         ELSE 'test' END AS split
  FROM documents
), counts AS (
  SELECT lang, source,
    COUNT(CASE WHEN split = 'train' THEN 1 END) AS n_tr,
    COUNT(CASE WHEN split = 'test' THEN 1 END) AS n_te
  FROM s WHERE split <> 'val' GROUP BY lang, source
), totals AS (
  SELECT lang, CAST(SUM(n_tr) AS BIGINT) AS tot_tr,
    CAST(SUM(n_te) AS BIGINT) AS tot_te
  FROM counts GROUP BY lang
)
SELECT c.lang, MAX(t.tot_tr) AS n_train, MAX(t.tot_te) AS n_test,
  CAST(ROUND(SUM(CAST(
    CASE WHEN t.tot_tr > 0 AND t.tot_te > 0 AND c.n_tr + c.n_te > 0 THEN
      (c.n_tr / t.tot_tr - c.n_te / t.tot_te) * (c.n_tr / t.tot_tr - c.n_te / t.tot_te)
        / (c.n_tr / t.tot_tr + c.n_te / t.tot_te)
    END AS DECIMAL(30,12))), 6) AS DOUBLE) AS drift
FROM counts c JOIN totals t USING (lang)
GROUP BY c.lang
"""


QUERIES: dict[str, Query] = {
    "q111_span_dedup": Query(q111_span_dedup, _Q111_SQL),
    "q112_pq_codes": Query(q112_pq_codes, _q112_sql()),
    "q113_split_drift": Query(q113_split_drift, _Q113_SQL),
}
