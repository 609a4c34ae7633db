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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from job_etl_spark.functions.chunking import tokens_expr
from job_etl_spark.functions.sqllit import (
    cached_expr,
    lit_double_array,
    sql_double,
    sql_double_array,
    sql_int,
)
from job_etl_spark.ml.dedup import hexint
from job_etl_spark.queries._util import Query, dround, sql_dround
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


def _span_hash_array(toks) -> "F.Column":
    """array<bigint> of 60-bit hashes of every overlapping _SPAN-token
    window — shared by q111 (dup-span detection) and q116 (split
    leakage)."""
    n_spans = F.size(toks) - F.lit(_SPAN - 1)
    return F.when(
        n_spans > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_spans, F.lit(1))),
            lambda i: hexint(F.concat_ws(" ", F.slice(toks, i, _SPAN))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


_SQL_SPANS = f"""
  SELECT doc_id,
    {_SQL_HEXINT.format(expr=f"array_to_string(toks[i:i+{_SPAN - 1}], ' ')")} AS h
  FROM t, LATERAL (
    SELECT unnest(range(1, greatest(len(toks) - {_SPAN - 2}, 1))) AS i
  ) u
  WHERE len(toks) >= {_SPAN}
"""

_SQL_TOKS = """
  SELECT doc_id,
    list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
"""


def q111_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    docs = parallel_table(spark, sf, "documents")
    # spans feeds both the occurrence count and the per-doc join —
    # checkpoint so tokenize + rolling-hash runs once; the materialized
    # (doc_id, h) bigint pairs are far smaller than re-hashing the text
    spans = docs.select(
        "doc_id", F.explode(_span_hash_array(tokens_expr("text"))).alias("h")
    ).localCheckpoint(eager=False)
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
WITH t AS ({_SQL_TOKS}
), s AS ({_SQL_SPANS}
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


def _emb_vec(spark: SparkSession, sf: str) -> DataFrame:
    return parallel_table(spark, sf, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("vec")
    )


def _pq_book(emb: DataFrame) -> list[list[float]]:
    """Deterministic codebook: the _PQ_K smallest-vec_id vectors (bounded
    collect; swap k-means books in at deployment)."""
    book = [
        list(r["vec"])
        for r in emb.select("vec_id", "vec").orderBy("vec_id").limit(_PQ_K).collect()
    ]
    if not book:
        raise ValueError("pq: empty corpus — no codebook")
    return book


def _pq_encode_exprs(book: list[list[float]]):
    """(codes, terms): per-subspace nearest-code columns and DECIMAL
    distortion terms, all map-only expressions over ``vec``.

    The candidate scoring is ONE higher-order transform over a literal
    (code-vector, ½|c|², −cid) struct array per subspace — the dot-product
    lambda is codegen'd once and looped (the ``ml/ann.bucket_expr``
    shape), so plan analysis + janino compile stay O(M) instead of
    O(M·K·D): measured ~2 s of per-run fixed overhead at any SF. Scores,
    tie-breaks, and fold order are bit-identical to the unrolled form."""

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
        # one rendered SQL literal per subspace codebook (sqllit.py):
        # one driver call instead of K×(_PQ_D+2) py4j round trips;
        # parse memoized (cached_expr) — the codebook is constant
        mat = cached_expr(
            "array("
            + ",".join(
                f"named_struct('v',{sql_double_array(cvec[m * _PQ_D : (m + 1) * _PQ_D])},"
                f"'h',{sql_double(0.5 * _py_sumsq(cvec[m * _PQ_D : (m + 1) * _PQ_D]))},"
                f"'n',{sql_int(-cid)})"
                for cid, cvec in enumerate(book)
            )
            + ")"
        )
        cands = F.transform(
            mat,
            lambda c: F.struct(
                (_dot(a_m, c["v"]) - c["h"]).alias("s"), c["n"].alias("n")
            ),
        )
        best = F.array_max(cands)
        codes.append((-best.getField("n")).cast("int").alias(f"code_{m}"))
        # |a−c|² = |a|² − 2·(dot − ½|c|²) — reuses the ranking score exactly
        terms.append(
            (a2 - 2.0 * best.getField("s")).cast("decimal(30,12)").alias(f"term_{m}")
        )
    return codes, terms


def q112_pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb_vec(spark, sf)
    codes, terms = _pq_encode_exprs(_pq_book(emb))
    enc = emb.select("vec_id", "label", *codes, *terms)
    code_str = F.concat_ws(",", *[F.col(f"code_{m}") for m in range(_PQ_M)])
    dist = sum(F.col(f"term_{m}") for m in range(1, _PQ_M)) + F.col("term_0")
    pervec = enc.select("label", code_str.alias("code_str"), dist.alias("dist"))
    return pervec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.countDistinct("code_str").alias("n_distinct_codes"),
        # decimal-exact per-vector distortions → IEEE divide → decimal
        # round (a decimal÷count division rounds differently across engines)
        F.round(
            (F.sum("dist").cast("double") / F.count(F.lit(1))).cast("decimal(24,10)"),
            6,
        )
        .cast("double")
        .alias("avg_distortion"),
    )


def _sql_pq_prefix() -> str:
    """Shared oracle CTE chain ``e → cb → scored → best``: per (vec, m)
    the chosen code id plus the dot/cn2/a2 terms (q112 encode, q114 ADC)."""
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
)"""


def _q112_sql() -> str:
    return _sql_pq_prefix() + """, pervec AS (
  SELECT vec_id, label,
    string_agg(CAST(c_id AS VARCHAR), ',' ORDER BY m) AS code_str,
    SUM(CAST(a2 - 2 * (dot - 0.5 * cn2) AS DECIMAL(30,12))) AS dist
  FROM best GROUP BY vec_id, label
)
SELECT label, COUNT(*) AS n_vecs,
  COUNT(DISTINCT code_str) AS n_distinct_codes,
  CAST(ROUND(CAST(CAST(SUM(dist) AS DOUBLE) / COUNT(*) AS DECIMAL(24,10)), 6)
    AS DOUBLE) AS avg_distortion
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


# ---------------------------------------------------------------------------
# q114 — PQ asymmetric-distance search (ADC): the query side of q112's
# encode, completing the FAISS-style PQ architecture. Each (bounded)
# query vector precomputes a 4×16 distance TABLE to the codebook; corpus
# distance is then 4 table lookups keyed by the row's PQ codes — the
# corpus's raw 64 floats are never touched at query time, which is the
# whole point at 100 TB (scan 4 bytes of codes, not 256 bytes of floats).
#
# Scale shape: tables fold into plan literals (bounded query set, like
# q48's probes), so scoring is a pure map over the encoded corpus; explode
# is ×|queries| on 16-byte rows; one window ranks per query. Exact-L2
# parity with the oracle because lookup tables and codes are both
# engine-deterministic.
# ---------------------------------------------------------------------------
_ADC_NQ = 5  # query vectors (the smallest vec_ids — bounded by construction)
_ADC_K = 5


def q114_adc_search(spark: SparkSession, sf: str) -> DataFrame:
    emb = _emb_vec(spark, sf)
    book = _pq_book(emb)
    codes, _terms = _pq_encode_exprs(book)
    qrows = emb.select("vec_id", "vec").orderBy("vec_id").limit(_ADC_NQ).collect()
    tables: list[tuple[int, list[list[float]]]] = []
    for r in qrows:
        qv = list(r["vec"])
        per_m = []
        for m in range(_PQ_M):
            qm = qv[m * _PQ_D : (m + 1) * _PQ_D]
            qa2 = _py_sumsq(qm)
            row = []
            for cvec in book:
                cm = cvec[m * _PQ_D : (m + 1) * _PQ_D]
                dot = 0.0
                for x, y in zip(qm, cm):
                    dot += x * y
                # same association as the oracle's a − 2·b + c
                row.append(qa2 - 2.0 * dot + _py_sumsq(cm))
            per_m.append(row)
        tables.append((r["vec_id"], per_m))
    enc = emb.select("vec_id", *codes)
    pairs = []
    for q_id, per_m in tables:
        dist = None
        for m in range(_PQ_M):
            lut = lit_double_array(per_m[m])
            term = F.element_at(lut, F.col(f"code_{m}") + 1).cast("decimal(30,12)")
            dist = term if dist is None else dist + term
        pairs.append(F.struct(F.lit(q_id).alias("q_id"), dist.alias("dist")))
    exploded = (
        enc.select("vec_id", F.explode(F.array(*pairs)).alias("p"))
        .select("vec_id", F.col("p.q_id").alias("q_id"), F.col("p.dist").alias("dist"))
        .where(F.col("vec_id") != F.col("q_id"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        exploded.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= _ADC_K)
        .select(
            "q_id",
            "rn",
            F.col("vec_id").alias("neighbor_id"),
            F.round("dist", 6).cast("double").alias("dist"),
        )
    )


def _q114_sql() -> str:
    lo, hi = "c.m * {d} + 1".format(d=_PQ_D), "c.m * {d} + {d}".format(d=_PQ_D)
    return _sql_pq_prefix() + f""", q AS (
  SELECT vec_id AS q_id, vec AS q_vec FROM e ORDER BY vec_id LIMIT {_ADC_NQ}
), dist AS (
  SELECT c.vec_id, q.q_id,
    SUM(CAST(
      list_dot_product(q.q_vec[{lo}:{hi}], q.q_vec[{lo}:{hi}])
      - 2 * list_dot_product(q.q_vec[{lo}:{hi}], cb.c_vec[{lo}:{hi}])
      + list_dot_product(cb.c_vec[{lo}:{hi}], cb.c_vec[{lo}:{hi}])
    AS DECIMAL(30,12))) AS dist
  FROM best c JOIN cb ON c.c_id = cb.c_id CROSS JOIN q
  WHERE c.vec_id <> q.q_id
  GROUP BY c.vec_id, q.q_id
), ranked AS (
  SELECT q_id, vec_id, dist,
    row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rn
  FROM dist
)
SELECT q_id, CAST(rn AS INT) AS rn, vec_id AS neighbor_id,
  CAST(ROUND(dist, 6) AS DOUBLE) AS dist
FROM ranked WHERE rn <= {_ADC_K}
"""


# ---------------------------------------------------------------------------
# q115 — linear quality classifier APPLY (fasttext-style): score = mean of
# per-token weights from a hashed weight table. The weights here are
# md5-derived pseudo-weights (deterministic in every engine — the operator
# under test is the APPLY path, not the training); swap in trained weights
# by replacing the hash-weight lambda with a broadcast map lookup.
#
# Scale shape: ZERO shuffles — the per-doc score is an in-row fold over
# the token array (no explode), so a 100 TB corpus scores in one map
# stage. Per-token weights cross into DECIMAL inside the fold, keeping the
# sum order-free and engine-exact.
# ---------------------------------------------------------------------------
def q115_linear_quality(spark: SparkSession, sf: str) -> DataFrame:
    docs = parallel_table(spark, sf, "documents")
    toks = tokens_expr("text")
    wsum = F.aggregate(
        toks,
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, t: (
            acc + ((hexint(t) % 2001) / F.lit(1000.0) - 1.0).cast("decimal(30,12)")
        ).cast("decimal(30,12)"),
    )
    n_toks = F.coalesce(F.size(toks), F.lit(0))
    score = F.when(
        n_toks > 0, F.round(wsum / n_toks, 6).cast("double")
    )
    return docs.select(
        "doc_id",
        "lang",
        n_toks.alias("n_toks"),
        score.alias("score"),
        F.coalesce(score > 0.0, F.lit(False)).alias("kept"),
    )


_Q115_SQL = f"""
WITH t AS ({_SQL_TOKS}
), w AS (
  SELECT doc_id,
    CAST(len(toks) AS INT) AS n_toks,
    SUM(CAST({_SQL_HEXINT.format(expr="tok")} % 2001 / 1000.0 - 1.0
        AS DECIMAL(30,12))) AS wsum
  FROM t, LATERAL (SELECT unnest(toks) AS tok) u
  GROUP BY doc_id, len(toks)
)
SELECT d.doc_id, d.lang,
  COALESCE(w.n_toks, 0) AS n_toks,
  CAST(ROUND(w.wsum / w.n_toks, 6) AS DOUBLE) AS score,
  COALESCE(CAST(ROUND(w.wsum / w.n_toks, 6) AS DOUBLE) > 0.0, FALSE) AS kept
FROM documents d LEFT JOIN w USING (doc_id)
"""


# ---------------------------------------------------------------------------
# q116 — train→test span leakage: after the deterministic split (q59's md5
# bucket), what fraction of TEST documents share an exact 8-token span
# with any TRAIN document? The eval-hygiene twin of q78's benchmark
# decontamination — this one audits the pipeline's own split.
#
# Scale shape: spans hash to 60-bit ints; the train side collapses to
# DISTINCT hashes (map-side combine), the test side left-semi joins on the
# hash — both shuffles keyed on the int, no strings, no doc×doc pairs.
# ---------------------------------------------------------------------------
def q116_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    docs = parallel_table(spark, sf, "documents")
    bucket = hexint(F.col("doc_id").cast("string")) % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    spans = docs.select(
        "doc_id",
        split.alias("split"),
        F.explode(_span_hash_array(tokens_expr("text"))).alias("h"),
    )
    train_h = spans.where(F.col("split") == "train").select("h").distinct()
    leaked = (
        spans.where(F.col("split") == "test")
        .join(train_h, "h", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("leak", F.lit(1))
    )
    test_docs = docs.select("doc_id", "lang", split.alias("split")).where(
        F.col("split") == "test"
    )
    agg = test_docs.join(leaked, "doc_id", "left").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_test_docs"),
        F.count("leak").alias("n_leaked_docs"),
    )
    return agg.select(
        "lang",
        "n_test_docs",
        "n_leaked_docs",
        dround(F.col("n_leaked_docs") / F.col("n_test_docs"), 6).alias("leak_ratio"),
    )


_Q116_SQL = f"""
WITH t AS ({_SQL_TOKS}
), s AS ({_SQL_SPANS}
), sp AS (
  SELECT doc_id, lang,
    CASE WHEN {_SQL_HEXINT.format(expr="CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
         WHEN {_SQL_HEXINT.format(expr="CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
         ELSE 'test' END AS split
  FROM documents
), train_h AS (
  SELECT DISTINCT h FROM s JOIN sp USING (doc_id) WHERE sp.split = 'train'
), leaked AS (
  SELECT DISTINCT s.doc_id FROM s JOIN sp USING (doc_id)
  WHERE sp.split = 'test' AND s.h IN (SELECT h FROM train_h)
)
SELECT sp.lang,
  COUNT(*) AS n_test_docs,
  COUNT(l.doc_id) AS n_leaked_docs,
  {sql_dround("COUNT(l.doc_id) / COUNT(*)", 6)} AS leak_ratio
FROM sp LEFT JOIN leaked l ON sp.doc_id = l.doc_id
WHERE sp.split = 'test'
GROUP BY sp.lang
"""


QUERIES: dict[str, Query] = {
    "q111_span_dedup": Query(q111_span_dedup, _Q111_SQL),
    "q112_pq_codes": Query(q112_pq_codes, _q112_sql()),
    "q113_split_drift": Query(q113_split_drift, _Q113_SQL),
    "q114_adc_search": Query(q114_adc_search, _q114_sql()),
    "q115_linear_quality": Query(q115_linear_quality, _Q115_SQL),
    "q116_split_leakage": Query(q116_split_leakage, _Q116_SQL),
}
