"""Deterministic mock source (reference parity: S2,
``services/source_extractor/adapters/mock_adapter.py:46-179``): same value
pools (6 titles × 5 companies × 5 locations cycled by index), same paging,
same injectable failure — used by tests and the smoke pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from job_etl_spark.sources.base import JobPostingRaw, SourceAdapter

JOB_TITLES = [
    "Data Engineer",
    "Analytics Engineer",
    "Data Scientist",
    "Machine Learning Engineer",
    "Data Analyst",
    "ETL Developer",
]
COMPANIES = ["Acme Corp", "Globex Inc", "Initech LLC", "Umbrella Corporation", "Wayne Enterprises"]
LOCATIONS = [
    "Montreal, QC, Canada",
    "Toronto, ON, Canada",
    "Vancouver, BC, Canada",
    "Remote",
    "New York, NY, USA",
]
REMOTE_TYPES = ["remote", "hybrid", "onsite"]
CONTRACT_TYPES = ["full_time", "part_time", "contract"]


class MockAdapter(SourceAdapter):
    def __init__(self, num_jobs: int = 100, jobs_per_page: int = 20, fail_on_attempt: int = 0):
        super().__init__(source_name="mock_api")
        self.num_jobs = num_jobs
        self.jobs_per_page = jobs_per_page
        self.fail_on_attempt = fail_on_attempt
        self.attempt_count = 0

    def fetch(self, page_token: str | None = None):
        self.attempt_count += 1
        if self.fail_on_attempt > 0 and self.attempt_count == self.fail_on_attempt:
            raise ConnectionError("Simulated API failure for testing")
        page = 0 if page_token is None else int(page_token)
        start = page * self.jobs_per_page
        end = min(start + self.jobs_per_page, self.num_jobs)
        jobs = [
            JobPostingRaw(
                source=self.source_name,
                payload=self._fake_job(i),
                provider_job_id=f"mock_{i}",
            )
            for i in range(start, end)
        ]
        next_token = str(page + 1) if end < self.num_jobs else None
        return jobs, next_token

    def _fake_job(self, i: int) -> dict:
        title = JOB_TITLES[i % len(JOB_TITLES)]
        company = COMPANIES[i % len(COMPANIES)]
        return {
            "title": title,
            "company": company,
            "location": LOCATIONS[i % len(LOCATIONS)],
            "remote_type": REMOTE_TYPES[i % len(REMOTE_TYPES)],
            "contract_type": CONTRACT_TYPES[i % len(CONTRACT_TYPES)],
            "salary_min": 70000 + (i * 1000 % 50000),
            "salary_max": 120000 + (i * 1000 % 50000),
            "salary_currency": "CAD",
            "description": (
                f"We are seeking a {title} to join our team at {company}. "
                f"This is a {REMOTE_TYPES[i % len(REMOTE_TYPES)]} position. "
                "You will work with Python, SQL, and various data tools."
            ),
            "skills": ["python", "sql", "airflow", "dbt"],
            "posted_date": "2025-10-15T10:00:00Z",
            "job_url": f"https://example.com/jobs/{i}",
            "apply_url": f"https://example.com/apply/{i}",
            "company_size": "51-200",
            "provider_job_id": f"mock_{i}",
        }

    def map_to_common_exprs(self, payload: Column) -> dict[str, Column]:
        g = lambda f: F.get_json_object(payload, f"$.{f}")  # noqa: E731
        return {
            "provider_job_id": g("provider_job_id"),
            "job_link": g("job_url"),
            "job_title": g("title"),
            "company": g("company"),
            "company_size": g("company_size"),
            "location": g("location"),
            "remote_type": F.coalesce(g("remote_type"), F.lit("unknown")),
            "contract_type": F.coalesce(g("contract_type"), F.lit("full_time")),
            "salary_min": g("salary_min"),
            "salary_max": g("salary_max"),
            "salary_currency": g("salary_currency"),
            "description": g("description"),
            "skills_raw": F.from_json(g("skills"), "array<string>"),
            "posted_at": g("posted_date"),
            "apply_url": g("apply_url"),
            "source": F.lit(self.source_name),
        }
