"""Fuzzy company matching (reference parity: J7/U6,
``services/enricher/company_matcher.py:45-165`` + Glassdoor client S13).

The reference calls a live API per company (10 candidates), fuzzy-matches
with rapidfuzz ``fuzz.ratio`` ≥ 80, and upserts the best hit; companies
with no match are marked skipped (``enriched_at`` set either way — the
cache semantics that stop reruns from re-calling the API,
``db_operations.py:560-587``).

Spark-first: candidates live in a TABLE (offline snapshot / cached API
results keyed by search name) — the fuzzy join becomes
   companies ⟕ candidates (equi-join on normalized name key)
   → score → window argmax → threshold.
Scoring is a native Indel-ratio approximation (SURVEY §2.8: Spark
``levenshtein`` differs slightly from rapidfuzz); a pandas_udf wrapping
rapidfuzz drops in when exact parity is needed and the lib is present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from job_etl_spark.functions.text import clean_company_name_expr

DEFAULT_SIMILARITY_THRESHOLD = 80  # company_matcher.py:19


def fuzzy_ratio_expr(a: Column, b: Column) -> Column:
    """0-100 similarity ≈ rapidfuzz fuzz.ratio. Indel-ratio approximation
    built on levenshtein: ratio = (1 − lev/(|a|+|b|)) · 100 — exact when
    no substitutions occur, slightly pessimistic otherwise."""
    denom = F.length(a) + F.length(b)
    return F.when(denom == 0, F.lit(100.0)).otherwise(
        (1 - F.levenshtein(a, b) / denom) * 100
    )


def _rapidfuzz_ratio_udf():
    """Exact fuzz.ratio via Arrow-batched pandas_udf; None if rapidfuzz is
    not installed (this container: it isn't)."""
    try:  # pragma: no cover
        from rapidfuzz import fuzz
    except ImportError:
        return None
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [fuzz.ratio(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
        )

    return ratio


def match_companies(
    companies: DataFrame,
    candidates: DataFrame,
    threshold: int = DEFAULT_SIMILARITY_THRESHOLD,
    exact_ratio: bool = False,
) -> DataFrame:
    """Best candidate per company needing enrichment.

    ``companies``: must have company_id, name, enriched_at.
    ``candidates``: search_name + candidate_* columns (the cached per-name
    API results; reference fan-out is 10 per name).

    Returns one row per pending company: matched candidate columns (NULL
    when below threshold / no candidates) + match_score. Rows keep the
    S8 scan order semantics (enriched_at IS NULL only).
    """
    pending = companies.where(F.col("enriched_at").isNull())
    key = clean_company_name_expr(F.col("name"))
    cands = candidates.withColumn("_k", clean_company_name_expr(F.col("search_name")))
    ratio_udf = _rapidfuzz_ratio_udf() if exact_ratio else None
    joined = pending.withColumn("_k", key).join(F.broadcast(cands), "_k", "left")

    cname = clean_company_name_expr(F.col("candidate_name"))
    score = (
        ratio_udf(F.col("_k"), cname)
        if ratio_udf is not None
        else fuzzy_ratio_expr(F.col("_k"), cname)
    )
    w = Window.partitionBy("company_id").orderBy(
        F.desc_nulls_last("match_score"), F.asc("candidate_name")
    )
    scored = joined.withColumn(
        "match_score", F.when(F.col("candidate_name").isNotNull(), score)
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_k")
    )
    hit = F.col("match_score") >= threshold
    out_cols = [c for c in best.columns if c.startswith("candidate_") or c == "search_name"]
    result = best
    for c in out_cols:
        result = result.withColumn(c, F.when(hit, F.col(c)))
    return result.withColumn(
        "match_score", F.when(hit, F.round(F.col("match_score"), 2))
    )


def apply_company_matches(companies: DataFrame, matches: DataFrame, run_ts) -> DataFrame:
    """J5-style write-back: matched rows get candidate fields; EVERY
    attempted row gets enriched_at stamped (match or skip) so reruns
    don't retry — the reference's skip-marker semantics."""
    upd = matches.select(
        "company_id",
        F.col("candidate_name").alias("matched_name"),
        "match_score",
        F.lit(run_ts).alias("enriched_at"),
    )
    base = companies
    for c in ["matched_name", "match_score"]:
        if c not in base.columns:
            base = base.withColumn(c, F.lit(None).cast("string" if c == "matched_name" else "double"))
    joined = base.alias("b").join(F.broadcast(upd.alias("u")), "company_id", "left")
    return joined.select(
        *[
            F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
            if c in ("matched_name", "match_score", "enriched_at")
            else F.col(f"b.{c}").alias(c)
            for c in base.columns
        ]
    )
