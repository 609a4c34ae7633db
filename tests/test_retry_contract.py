"""U8 retry/backoff twins (``tests/unit/test_retry_logic.py:10-192``) and
the cross-adapter source contract (``tests/unit/test_source_adapter.py:
13-227``): every adapter's fetch returns (list[JobPostingRaw], token),
payloads map to the 16-field common format, and enum outputs stay in
their domains."""

from __future__ import annotations

import json

import pytest

from job_etl_spark.sources.base import JobPostingRaw
from job_etl_spark.sources.jsearch_adapter import JSearchAdapter, retry_with_backoff
from job_etl_spark.sources.mock_adapter import MockAdapter

pytestmark = pytest.mark.smoke


class TestRetryBackoff:
    def test_first_attempt_success_no_retry(self):
        calls = {"n": 0}

        def fn():
            calls["n"] += 1
            return "ok"

        assert retry_with_backoff(fn, retries=3, delay=0.0) == "ok"
        assert calls["n"] == 1

    def test_succeeds_after_failures(self):
        calls = {"n": 0}

        def fn():
            calls["n"] += 1
            if calls["n"] < 3:
                raise ConnectionError("temporary")
            return "ok"

        assert retry_with_backoff(fn, retries=3, delay=0.0) == "ok"
        assert calls["n"] == 3

    def test_exhausts_then_raises(self):
        calls = {"n": 0}

        def fn():
            calls["n"] += 1
            raise ConnectionError("always")

        with pytest.raises(ConnectionError, match="always"):
            retry_with_backoff(fn, retries=3, delay=0.0)
        assert calls["n"] == 4  # initial + 3 retries

    def test_exponential_backoff_delays(self, monkeypatch):
        """delay·factor^attempt: 0.1, 0.2, 0.4 (reference timing test,
        asserted via captured sleeps instead of wall clock)."""
        sleeps: list[float] = []
        import job_etl_spark.sources.jsearch_adapter as mod

        monkeypatch.setattr(mod.time, "sleep", sleeps.append)

        def fn():
            raise ConnectionError("x")

        with pytest.raises(ConnectionError):
            retry_with_backoff(fn, retries=3, delay=0.1, factor=2.0)
        assert sleeps == [0.1, 0.2, 0.4]


def _adapters():
    return [
        MockAdapter(num_jobs=7, jobs_per_page=3),
        JSearchAdapter(
            api_key="k",
            max_jobs=7,
            retries=0,
            delay=0.0,
            transport=lambda u, h, p, t: (
                200,
                {
                    "data": [
                        {"job_id": f"p{p['page']}j{i}", "job_title": "T",
                         "employer_name": "Acme", "job_city": "Montreal"}
                        for i in range(3)
                    ]
                },
            ),
        ),
    ]


COMMON_FIELDS = [
    "provider_job_id", "job_link", "job_title", "company", "company_size",
    "location", "remote_type", "contract_type", "salary_min", "salary_max",
    "salary_currency", "description", "skills_raw", "posted_at", "apply_url",
    "source",
]


@pytest.mark.parametrize("adapter", _adapters(), ids=["mock", "jsearch"])
def test_source_adapter_contract(spark, adapter):
    """Contract (test_source_adapter.py): fetch pages until exhaustion,
    every page is (list[JobPostingRaw], str|None); the payloads map to
    all 16 canonical fields with in-domain enums."""
    token, pages = None, 0
    all_jobs = []
    while True:
        jobs, token = adapter.fetch(token)
        assert isinstance(jobs, list)
        assert all(isinstance(j, JobPostingRaw) for j in jobs)
        all_jobs.extend(jobs)
        pages += 1
        if token is None:
            break
        assert isinstance(token, str)
    assert all_jobs and pages >= 2  # paging actually happened

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(json.dumps(j.payload),) for j in all_jobs], "payload string"
    )
    exprs = adapter.map_to_common_exprs(F.col("payload"))
    assert sorted(COMMON_FIELDS) == sorted(exprs)
    rows = df.select(*[v.alias(k) for k, v in exprs.items()]).collect()
    for r in rows:
        assert r["job_title"] and r["company"] and r["location"]
        assert r["remote_type"] in ("remote", "hybrid", "onsite", "unknown")
        assert r["contract_type"] in (
            "full_time", "part_time", "contract", "intern", "temp", "unknown"
        )
