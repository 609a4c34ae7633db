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

CONTRACT_TYPE_MAP = {
    "FULLTIME": "full_time",
    "PARTTIME": "part_time",
    "CONTRACTOR": "contract",
    "INTERN": "intern",
    "TEMPORARY": "temp",
}


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
    def __init__(
        self,
        api_key: str | None = None,
        query: str = "data engineer",
        max_jobs: int = DEFAULT_MAX_JOBS,
        base_url: str = "https://jsearch.example/search",
    ):
        super().__init__(source_name="jsearch")
        self.api_key = api_key
        self.query = query
        self.max_jobs = max_jobs
        self.base_url = base_url
        self._fetched = 0

    def fetch(self, page_token: str | None = None):
        """Page-number token; stops at max_jobs (jsearch_adapter.py:186-269)."""
        try:
            import requests  # gated: not guaranteed in this container
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "jsearch live fetch requires 'requests'; use MockAdapter offline"
            ) from e

        page = 1 if page_token is None else int(page_token)

        def _call():
            resp = requests.get(
                self.base_url,
                params={"query": self.query, "page": page, "num_pages": 1},
                headers={"X-RapidAPI-Key": self.api_key or ""},
                timeout=30,
            )
            resp.raise_for_status()
            return resp.json()

        data = retry_with_backoff(_call)
        jobs = [
            JobPostingRaw(
                source=self.source_name,
                payload=item,
                provider_job_id=item.get("job_id"),
            )
            for item in data.get("data", [])
        ]
        self._fetched += len(jobs)
        has_more = bool(jobs) and self._fetched < self.max_jobs
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
