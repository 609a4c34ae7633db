"""S13 contract tests — mirror the reference client suite
(``tests/unit/services/enricher/test_glassdoor_client.py:11-147``): auth,
limit clamp 1–100, 401/429/5xx taxonomy, network degrade-to-empty,
unexpected-structure degrade, both response shapes — plus the
executor-side ``batch_lookup`` operator with a stubbed transport and the
persisted-cache anti-join semantics."""

from __future__ import annotations

import json

import pytest

from job_etl_spark.sources.lookup_client import (
    CANDIDATE_SCHEMA,
    CompanyLookupClient,
    LookupAuthError,
    LookupHTTPError,
    LookupRateLimitError,
    LookupTransportError,
    batch_lookup,
)

pytestmark = pytest.mark.smoke


def _ok_body(cands):
    return 200, json.dumps({"status": "OK", "data": cands})


def _client(transport, **kw):
    return CompanyLookupClient(
        api_key="test-key", transport=transport, retries=0, delay=0.0, **kw
    )


class TestClientContract:
    def test_init_key_sources(self, monkeypatch):
        assert _client(None).api_key == "test-key"
        monkeypatch.setenv("JOBSPARK_LOOKUP_API_KEY", "env-key")
        assert CompanyLookupClient(transport=lambda *a: _ok_body([])).api_key == "env-key"
        monkeypatch.delenv("JOBSPARK_LOOKUP_API_KEY")
        with pytest.raises(ValueError, match="JOBSPARK_LOOKUP_API_KEY"):
            CompanyLookupClient(api_key=None)

    def test_success_flat_and_nested_shapes(self):
        cands = [{"company_id": 123, "name": "Test Company", "rating": 4.5}]
        flat = _client(lambda u, h, p, t: (200, json.dumps({"data": cands})))
        nested = _client(
            lambda u, h, p, t: (200, json.dumps({"value": {"status": "OK", "data": cands}}))
        )
        assert flat.search_company("Test Company")[0]["company_id"] == 123
        assert nested.search_company("Test Company")[0]["name"] == "Test Company"

    def test_auth_header_and_query_params(self):
        seen = {}

        def transport(url, headers, params, timeout):
            seen.update(url=url, headers=headers, params=params)
            return _ok_body([])

        _client(transport).search_company("Acme", limit=7)
        assert seen["headers"]["x-api-key"] == "test-key"
        assert seen["params"] == {"query": "Acme", "limit": 7}
        assert seen["url"].endswith("/company-search")

    @pytest.mark.parametrize("asked,sent", [(200, 100), (0, 1), (-5, 1), (10, 10)])
    def test_limit_clamped_1_to_100(self, asked, sent):
        seen = {}

        def transport(url, headers, params, timeout):
            seen.update(params)
            return _ok_body([])

        _client(transport).search_company("X", limit=asked)
        assert seen["limit"] == sent

    def test_error_taxonomy(self):
        with pytest.raises(LookupAuthError):
            _client(lambda *a: (401, "Unauthorized")).search_company("X")
        with pytest.raises(LookupRateLimitError):
            _client(lambda *a: (429, "Too many")).search_company("X")
        with pytest.raises(LookupHTTPError, match="500"):
            _client(lambda *a: (500, "boom")).search_company("X")

    def test_network_failure_degrades_to_empty(self):
        def transport(*a):
            raise LookupTransportError("connection refused")

        assert _client(transport).search_company("X") == []

    def test_unexpected_structures_degrade_to_empty(self):
        assert _client(lambda *a: (200, "not json")).search_company("X") == []
        assert _client(lambda *a: (200, json.dumps({"odd": 1}))).search_company("X") == []
        assert _client(lambda *a: (200, json.dumps({"data": "nope"}))).search_company("X") == []
        assert _client(lambda *a: (200, json.dumps([1, 2]))).search_company("X") == []

    def test_retry_then_success(self):
        calls = {"n": 0}

        def transport(url, headers, params, timeout):
            calls["n"] += 1
            if calls["n"] < 3:
                raise LookupTransportError("flaky")
            return _ok_body([{"company_id": 1, "name": "A"}])

        c = CompanyLookupClient(api_key="k", transport=transport, retries=3, delay=0.0)
        assert c.search_company("A")[0]["name"] == "A"
        assert calls["n"] == 3


# ---------------------------------------------------------------------------
# executor-side batch operator
# ---------------------------------------------------------------------------
def _make_stub_factory():
    """Deterministic executor-safe stub (2 candidates per known name),
    built as closures so cloudpickle ships them BY VALUE — the test
    module itself is not importable on executors."""
    import json as _json

    def transport(url, headers, params, timeout):
        q = params["query"]
        if q == "Nowhere Inc":
            return 200, _json.dumps({"data": []})
        return 200, _json.dumps(
            {
                "data": [
                    {"company_id": f"{q}-1", "name": q, "rating": 4.0, "review_count": 10},
                    {"company_id": f"{q}-2", "name": q + " Ltd", "rating": 3.0, "review_count": 2},
                ]
            }
        )

    def factory():
        from job_etl_spark.sources.lookup_client import CompanyLookupClient as C

        return C(api_key="k", transport=transport, retries=0, delay=0.0)

    return factory


def test_batch_lookup_fans_out_and_caches(spark):
    pending = spark.createDataFrame(
        [("c1", "Acme"), ("c2", "Globex"), ("c3", "Nowhere Inc"), ("c4", "Acme")],
        "company_id string, name string",
    )
    out = batch_lookup(pending, _make_stub_factory()).collect()
    by_name: dict[str, list] = {}
    for r in out:
        by_name.setdefault(r["search_name"], []).append(r)
    # distinct names only (Acme once), 2 candidates each; no-candidate
    # names still get their cache marker row
    assert sorted(by_name) == ["Acme", "Globex", "Nowhere Inc"]
    assert len(by_name["Acme"]) == 2 and by_name["Acme"][0]["lookup_status"] == "ok"
    assert by_name["Nowhere Inc"][0]["lookup_status"] == "no_candidates"
    assert by_name["Nowhere Inc"][0]["candidate_name"] is None

    # cache anti-join: cached names (including the no-candidate marker)
    # are never re-fetched
    cache = spark.createDataFrame(out, CANDIDATE_SCHEMA)
    out2 = batch_lookup(pending, _make_stub_factory(), cache=cache).collect()
    assert out2 == []


def test_transport_errors_are_not_cached_as_no_candidates(spark):
    """A network failure must be recorded as transport_error and re-fetched
    on the next run — caching it as no_candidates would permanently
    suppress the lookup."""

    def make_failing_factory():
        def transport(url, headers, params, timeout):
            raise LookupTransportError("network down")

        def factory():
            from job_etl_spark.sources.lookup_client import CompanyLookupClient as C

            return C(api_key="k", transport=transport, retries=0, delay=0.0)

        return factory

    pending = spark.createDataFrame([("c1", "Acme")], "company_id string, name string")
    out = batch_lookup(pending, make_failing_factory()).collect()
    assert len(out) == 1 and out[0]["lookup_status"] == "transport_error"

    # rerun with the error row in the cache + a healthy transport: the name
    # IS retried (anti-join skips only ok/no_candidates rows)
    cache = spark.createDataFrame(out, CANDIDATE_SCHEMA)
    out2 = batch_lookup(pending, _make_stub_factory(), cache=cache).collect()
    assert {r["lookup_status"] for r in out2} == {"ok"}


def test_batch_lookup_feeds_matcher(spark):
    from job_etl_spark.pipeline.company_match import match_companies

    companies = spark.createDataFrame(
        [("c1", "Acme", None), ("c2", "Nowhere Inc", None)],
        "company_id string, name string, enriched_at timestamp",
    )
    cands = batch_lookup(companies, _make_stub_factory()).where("lookup_status = 'ok'")
    best = {
        r["company_id"]: r for r in match_companies(companies, cands).collect()
    }
    assert best["c1"]["candidate_name"] == "Acme"
    assert best["c1"]["match_score"] >= 80
    assert best["c2"]["candidate_name"] is None
