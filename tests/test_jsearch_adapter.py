"""S1 adapter contract tests — twins of the reference suite
(``tests/unit/test_jsearch_adapter.py:85-630``): pagination tokens,
cumulative max_jobs stop, country canonicalization, 401/429 taxonomy,
empty/missing-data responses, api-call counting incl. retries, and the
payload→common mapping (employment types, location formats) evaluated
through the actual Spark column expressions."""

from __future__ import annotations

import json

import pytest

from job_etl_spark.sources.jsearch_adapter import (
    CONTRACT_TYPE_MAP,
    JSearchAdapter,
    SourceHTTPError,
    canonicalize_country_code,
)

pytestmark = pytest.mark.smoke


def _jobs_response(n, start=0):
    return {
        "status": "OK",
        "data": [
            {"job_id": f"j{start + i}", "job_title": f"T{start + i}", "employer_name": "Acme"}
            for i in range(n)
        ],
    }


def _adapter(transport, **kw):
    kw.setdefault("api_key", "test-key")
    kw.setdefault("retries", 0)
    kw.setdefault("delay", 0.0)
    return JSearchAdapter(transport=transport, **kw)


class TestCountryCanonicalization:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Canada", "ca"),
            ("canada", "ca"),
            ("United States", "us"),
            ("USA", "us"),
            ("United Kingdom", "uk"),
            ("Great Britain", "uk"),
            ("ca", "ca"),
            ("CA", "ca"),
            (" us ", "us"),
            ("Atlantis", None),
            ("", None),
            (None, None),
        ],
    )
    def test_canonicalize(self, raw, expected):
        assert canonicalize_country_code(raw) == expected

    def test_unrecognized_falls_back_to_default(self):
        a = _adapter(lambda *x: (200, _jobs_response(1)), country="Atlantis")
        assert a.country_code == "us" and a.country == "Atlantis"

    def test_request_carries_canonical_country(self):
        seen = {}

        def transport(url, headers, params, timeout):
            seen.update(params)
            return 200, _jobs_response(1)

        _adapter(transport, country="Canada").fetch()
        assert seen["country"] == "ca"
        assert seen["num_pages"] == 1


class TestPagination:
    def test_page_tokens_and_max_jobs_stop(self):
        pages = []

        def transport(url, headers, params, timeout):
            pages.append(params["page"])
            return 200, _jobs_response(10, start=(params["page"] - 1) * 10)

        a = _adapter(transport, max_jobs=25)
        token, total = None, 0
        while True:
            jobs, token = a.fetch(token)
            total += len(jobs)
            if token is None:
                break
        # 10 + 10 + 10 = 30 fetched over pages 1..3; the stop fires when the
        # cumulative count reaches max_jobs (reference: fetch whole pages,
        # stop AFTER crossing the cap)
        assert pages == [1, 2, 3]
        assert total == 30 and a.total_jobs_fetched == 30

    def test_empty_response_ends_pagination(self):
        a = _adapter(lambda *x: (200, {"status": "OK", "data": []}))
        jobs, token = a.fetch()
        assert jobs == [] and token is None

    def test_missing_data_key_ends_pagination(self):
        a = _adapter(lambda *x: (200, {"status": "OK"}))
        jobs, token = a.fetch()
        assert jobs == [] and token is None


class TestErrorTaxonomy:
    def test_401(self):
        with pytest.raises(SourceHTTPError, match="Invalid API key"):
            _adapter(lambda *x: (401, {})).fetch()

    def test_429(self):
        with pytest.raises(SourceHTTPError, match="Rate limit"):
            _adapter(lambda *x: (429, {})).fetch()

    def test_500(self):
        with pytest.raises(SourceHTTPError, match="API error 500"):
            _adapter(lambda *x: (500, {})).fetch()

    def test_api_call_count_includes_retries(self):
        calls = {"n": 0}

        def transport(url, headers, params, timeout):
            calls["n"] += 1
            if calls["n"] < 3:
                raise ConnectionError("flaky")
            return 200, _jobs_response(1)

        a = _adapter(transport, retries=3)
        a.fetch()
        assert calls["n"] == 3 and a.api_call_count == 3


class TestPayloadMapping:
    """map_to_common as Spark column expressions — employment-type map and
    location formats (reference test classes at :371,:398), one action."""

    CASES = [
        # (payload, expected common fields)
        (
            {"job_id": "1", "job_title": "DE", "employer_name": "Acme",
             "job_city": "Montreal", "job_state": "QC", "job_country": "CA",
             "job_employment_type": "FULLTIME", "job_is_remote": False},
            {"location": "Montreal, QC, CA", "contract_type": "full_time",
             "remote_type": "onsite"},
        ),
        (
            {"job_id": "2", "job_title": "DE", "employer_name": "Acme",
             "job_city": "Montreal", "job_employment_type": "PARTTIME"},
            {"location": "Montreal", "contract_type": "part_time",
             "remote_type": "onsite"},
        ),
        (
            {"job_id": "3", "job_title": "DE", "employer_name": "Acme",
             "job_country": "CA", "job_employment_type": "CONTRACTOR"},
            {"location": "CA", "contract_type": "contract", "remote_type": "onsite"},
        ),
        (
            {"job_id": "4", "job_title": "DE", "employer_name": "Acme",
             "job_employment_type": "INTERN"},
            {"location": "Unknown", "contract_type": "intern", "remote_type": "unknown"},
        ),
        (
            {"job_id": "5", "job_title": "DE", "employer_name": "Acme",
             "job_employment_type": "TEMPORARY", "job_is_remote": True},
            {"location": "Unknown", "contract_type": "temp", "remote_type": "remote"},
        ),
        (
            {"job_id": "6", "job_title": "DE", "employer_name": "Acme",
             "job_employment_type": "GIG-ECONOMY"},
            {"location": "Unknown", "contract_type": "unknown", "remote_type": "unknown"},
        ),
        (
            {"job_id": "7"},  # minimal payload
            {"location": "Unknown", "contract_type": "unknown",
             "remote_type": "unknown", "job_title": "Unknown Title",
             "company": "Unknown Company"},
        ),
    ]

    def test_mapping(self, spark):
        from pyspark.sql import functions as F

        a = _adapter(lambda *x: (200, _jobs_response(0)))
        df = spark.createDataFrame(
            [(i, json.dumps(p)) for i, (p, _) in enumerate(self.CASES)],
            "i int, payload string",
        )
        exprs = a.map_to_common_exprs(F.col("payload"))
        out = {
            r["i"]: r
            for r in df.select(
                "i", *[v.alias(k) for k, v in exprs.items()]
            ).collect()
        }
        for i, (_, want) in enumerate(self.CASES):
            for k, v in want.items():
                assert out[i][k] == v, (i, k, out[i][k], v)
        assert sorted(CONTRACT_TYPE_MAP.values()) == sorted(
            ["full_time", "part_time", "contract", "intern", "temp"]
        )
