"""Fuzzy company matcher (J7/U6) semantics: suffix-stripped normalization,
argmax over candidates, threshold 80, skip-marker cache semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from job_etl_spark.pipeline.company_match import apply_company_matches, match_companies


def _frames(spark):
    companies = spark.createDataFrame(
        [
            ("c1", "Acme Corp Inc.", None),
            ("c2", "Globex   LLC", None),
            ("c3", "Totally Unknown Co", None),
            ("c4", "Already Done", dt.datetime(2026, 1, 1)),
        ],
        "company_id string, name string, enriched_at timestamp",
    )
    candidates = spark.createDataFrame(
        [
            ("Acme Corp Inc.", "Acme Corporation", 4.1),
            ("Acme Corp Inc.", "Acme Corp", 4.5),
            ("Acme Corp Inc.", "ACME Industrial", 3.0),
            ("Globex   LLC", "Globex", 3.9),
        ],
        "search_name string, candidate_name string, candidate_rating double",
    )
    return companies, candidates


def test_argmax_threshold_and_pending_scan(spark):
    companies, candidates = _frames(spark)
    out = {r["company_id"]: r for r in match_companies(companies, candidates).collect()}
    # only pending (enriched_at IS NULL) companies appear
    assert set(out) == {"c1", "c2", "c3"}
    # best candidate: 'Acme Corp' normalizes identically to 'Acme Corp Inc.'
    assert out["c1"]["candidate_name"] == "Acme Corp"
    assert out["c1"]["match_score"] == 100.0
    assert out["c2"]["candidate_name"] == "Globex"
    # no candidates at all → no match columns
    assert out["c3"]["candidate_name"] is None and out["c3"]["match_score"] is None


def test_apply_marks_skip_even_without_match(spark):
    companies, candidates = _frames(spark)
    matches = match_companies(companies, candidates)
    run_ts = dt.datetime(2026, 2, 2)
    updated = apply_company_matches(companies, matches, run_ts)
    rows = {r["company_id"]: r for r in updated.collect()}
    # matched and unmatched pending rows BOTH get enriched_at (cache marker)
    assert rows["c1"]["enriched_at"] == run_ts and rows["c1"]["matched_name"] == "Acme Corp"
    assert rows["c3"]["enriched_at"] == run_ts and rows["c3"]["matched_name"] is None
    # previously-enriched row untouched
    assert rows["c4"]["enriched_at"] == dt.datetime(2026, 1, 1)
