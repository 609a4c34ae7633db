"""JSearch-shaped REST source (reference parity: S1/U3,
``services/source_extractor/adapters/jsearch_adapter.py``).

The payload→common mapping (``jsearch_adapter.py:287-380``) is pure column
expressions; the HTTP fetch is driver-side with the reference's retry
policy (3 retries, 1 s initial, 2× backoff — ``retry.py:17-112``) and is
gated behind an import-try so the engine works without network access.
"""

from __future__ import annotations

import time

from pyspark.sql import Column
from pyspark.sql import functions as F

from job_etl_spark.sources.base import JobPostingRaw, SourceAdapter

DEFAULT_MAX_JOBS = 20  # jsearch_adapter.py:25
DEFAULT_COUNTRY = "us"

CONTRACT_TYPE_MAP = {
    "FULLTIME": "full_time",
    "PARTTIME": "part_time",
    "CONTRACTOR": "contract",
    "INTERN": "intern",
    "TEMPORARY": "temp",
}

# supported country names → ISO alpha-2 (jsearch_adapter.py:30-36)
COUNTRY_CODE_MAP = {
    "canada": "ca",
    "united states": "us",
    "usa": "us",
    "united kingdom": "uk",
    "great britain": "uk",
}


def canonicalize_country_code(country: str | None) -> str | None:
    """ISO-alpha-2 passthrough (lowercased) or name-map lookup; None when
    unrecognized (jsearch_adapter.py:272-285)."""
    if not country:
        return None
    normalized = country.strip().lower()
    if not normalized:
        return None
    if len(normalized) == 2 and normalized.isalpha():
        return normalized
    return COUNTRY_CODE_MAP.get(normalized)


class SourceHTTPError(RuntimeError):
    """4xx/5xx API response (401/429 carry the reference's messages)."""


def retry_with_backoff(fn, retries: int = 3, delay: float = 1.0, factor: float = 2.0):
    """U8: N retries with exponential backoff (retry.py:17-112)."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception:
            if attempt >= retries:
                raise
            time.sleep(delay * (factor**attempt))
            attempt += 1


class JSearchAdapter(SourceAdapter):
    """S1 surface parity (jsearch_adapter.py:50-269): query/country/
    date_posted search config, country canonicalization with fallback to
    the default, page-number tokens, cumulative max_jobs stop, api-call
    counting, 401/429 error taxonomy. ``transport(url, headers, params,
    timeout) -> (status_code, json_dict)`` is injectable so contract
    tests run offline (the reference mocks requests.get the same way)."""

    def __init__(
        self,
        api_key: str | None = None,
        query: str = "data engineer",
        max_jobs: int = DEFAULT_MAX_JOBS,
        base_url: str = "https://jsearch.example",
        country: str = DEFAULT_COUNTRY,
        date_posted: str = "all",
        transport=None,
        retries: int = 3,
        delay: float = 1.0,
    ):
        super().__init__(source_name="jsearch")
        self.api_key = api_key
        self.query = query
        self.max_jobs = max_jobs
        self.base_url = base_url.rstrip("/")
        self.country = country
        self.country_code = canonicalize_country_code(country) or DEFAULT_COUNTRY
        self.date_posted = date_posted
        self.transport = transport
        self.retries = retries
        self.delay = delay
        self.api_call_count = 0
        self.total_jobs_fetched = 0

    def _default_transport(self, url, headers, params, timeout):
        try:
            import requests  # gated: not guaranteed in this container
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "jsearch live fetch requires 'requests'; use MockAdapter offline"
            ) from e
        resp = requests.get(url, headers=headers, params=params, timeout=timeout)
        return resp.status_code, resp.json()

    def _api_call(self, params: dict) -> dict:
        url = f"{self.base_url}/search"
        headers = {"X-API-Key": self.api_key or "", "Content-Type": "application/json"}
        transport = self.transport or self._default_transport

        def _call():
            self.api_call_count += 1  # counts every attempt incl. retries
            return transport(url, headers, params, 30)

        status, data = retry_with_backoff(_call, retries=self.retries, delay=self.delay)
        if status == 401:
            raise SourceHTTPError("Invalid API key - check JSEARCH_API_KEY")
        if status == 429:
            raise SourceHTTPError("Rate limit exceeded - too many API calls")
        if status >= 400:
            raise SourceHTTPError(f"API error {status}")
        return data if isinstance(data, dict) else {}

    def page_token(self, idx: int) -> str | None:
        """JSearch pages are 1-based: 0-based index ``idx`` → page idx+1."""
        return None if idx == 0 else str(idx + 1)

    def fetch(self, page_token: str | None = None):
        """Page-number token; stops at cumulative max_jobs
        (jsearch_adapter.py:186-269)."""
        page = 1 if page_token is None else int(page_token)
        data = self._api_call(
            {
                "query": self.query,
                "country": self.country_code,
                "page": page,
                "num_pages": 1,
                "date_posted": self.date_posted,
            }
        )
        items = data.get("data", [])
        if not isinstance(items, list) or not items:
            return [], None
        jobs = [
            JobPostingRaw(
                source=self.source_name,
                payload=item,
                provider_job_id=item.get("job_id"),
            )
            for item in items
        ]
        self.total_jobs_fetched += len(jobs)
        has_more = self.total_jobs_fetched < self.max_jobs
        return jobs, (str(page + 1) if has_more else None)

    def map_to_common_exprs(self, payload: Column) -> dict[str, Column]:
        g = lambda f: F.get_json_object(payload, f"$.{f}")  # noqa: E731
        city, state, country = g("job_city"), g("job_state"), g("job_country")
        # comma-join of present parts, else "Unknown" (jsearch_adapter.py:316-323)
        location = F.concat_ws(
            ", ",
            *[F.when(c.isNotNull() & (c != ""), c) for c in (city, state, country)],
        )
        location = F.when(location == "", "Unknown").otherwise(location)
        remote_type = (
            F.when(F.lower(g("job_is_remote")) == "true", "remote")
            .when(location != "Unknown", "onsite")
            .otherwise("unknown")
        )
        ct_map = F.create_map(
            *[F.lit(x) for kv in CONTRACT_TYPE_MAP.items() for x in kv]
        )
        contract_type = F.coalesce(
            F.element_at(ct_map, g("job_employment_type")), F.lit("unknown")
        )
        return {
            "provider_job_id": g("job_id"),
            "job_link": g("job_apply_link"),
            "job_title": F.coalesce(g("job_title"), F.lit("Unknown Title")),
            "company": F.coalesce(g("employer_name"), F.lit("Unknown Company")),
            "company_size": F.lit(None).cast("string"),  # not provided by JSearch
            "location": location,
            "remote_type": remote_type,
            "contract_type": contract_type,
            "salary_min": g("job_min_salary"),
            "salary_max": g("job_max_salary"),
            "salary_currency": F.coalesce(g("job_salary_currency"), F.lit("USD")),
            "description": g("job_description"),
            "skills_raw": F.lit(None).cast("array<string>"),  # enricher fills
            "posted_at": g("job_posted_at_datetime_utc"),
            "apply_url": g("job_apply_link"),
            "source": F.lit(self.source_name),
        }
