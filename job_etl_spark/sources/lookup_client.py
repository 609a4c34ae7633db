"""S13 — external company-lookup source with executor-side batched fetch.

Reference parity: ``services/enricher/glassdoor_client.py:55-196`` (auth
required, limit clamp 1–100, error taxonomy: 401/429/4xx raise, network
failures degrade to an empty candidate list, malformed/unexpected JSON
degrades to an empty list, flat ``{"data": [...]}`` and nested
``{"value": {"data": [...]}}`` response shapes) and the cache-table
semantics of ``db_operations.py:560-587`` (every attempted name is
recorded so reruns never re-call the API).

Spark-first design — the 100 TB shape:

- The CLIENT is a tiny picklable object with an injectable ``transport``
  callable, so executors construct it per partition and tests stub the
  HTTP layer without any live endpoint (this container is offline).
- ``batch_lookup`` is the operator: distinct pending names, anti-joined
  against the persisted cache table, fanned out via ``mapInPandas`` —
  each executor batch fetches its names with U8 retry/backoff and yields
  one row per candidate. No driver-side loop, no per-row lambda; the
  fan-out parallelism is the DataFrame's partitioning.
- Returned candidates feed ``pipeline.company_match.match_companies``
  (J7 argmax) and are appended to the cache table by the caller.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from job_etl_spark.sources.jsearch_adapter import retry_with_backoff

API_TIMEOUT_SECONDS = 30
DEFAULT_BASE_URL = "https://lookup.example"  # placeholder; override via env
DEFAULT_LIMIT = 10

CANDIDATE_SCHEMA = (
    "search_name string, candidate_id string, candidate_name string, "
    "candidate_rating double, candidate_review_count int, lookup_status string"
)


class LookupHTTPError(RuntimeError):
    """4xx/5xx API response (taxonomy parity: these propagate)."""


class LookupAuthError(LookupHTTPError):
    """401 — bad/missing API key."""


class LookupRateLimitError(LookupHTTPError):
    """429 — rate limited."""


class LookupTransportError(RuntimeError):
    """Network-level failure; ``search_company`` degrades to []."""


def _default_transport(url: str, headers: dict, params: dict, timeout: int):
    """Live HTTP transport (requests). Kept separate so offline runs and
    tests inject a stub; importing requests lazily keeps executors free
    of the dependency unless a live fetch actually happens."""
    try:  # pragma: no cover - no network in this container
        import requests

        resp = requests.get(url, headers=headers, params=params, timeout=timeout)
        return resp.status_code, resp.text
    except Exception as exc:  # noqa: BLE001 - normalized to transport error
        raise LookupTransportError(str(exc)) from exc


class CompanyLookupClient:
    """Company-search API client with injectable transport.

    ``transport(url, headers, params, timeout) -> (status_code, body_text)``
    """

    def __init__(
        self,
        api_key: str | None = None,
        base_url: str | None = None,
        transport: Callable | None = None,
        retries: int = 3,
        delay: float = 1.0,
    ):
        self.api_key = api_key or os.getenv("JOBSPARK_LOOKUP_API_KEY")
        self.base_url = (
            base_url or os.getenv("JOBSPARK_LOOKUP_BASE_URL", DEFAULT_BASE_URL)
        ).rstrip("/")
        if not self.api_key:
            raise ValueError(
                "JOBSPARK_LOOKUP_API_KEY must be set in environment or passed"
            )
        self.transport = transport or _default_transport
        self.retries = retries
        self.delay = delay

    def search_company(
        self, query: str, limit: int = DEFAULT_LIMIT, raise_transport: bool = False
    ) -> list[dict]:
        url = f"{self.base_url}/company-search"
        headers = {"x-api-key": self.api_key, "Content-Type": "application/json"}
        params = {"query": query, "limit": min(max(1, int(limit)), 100)}

        def _call():
            return self.transport(url, headers, params, API_TIMEOUT_SECONDS)

        try:
            status, body = retry_with_backoff(
                _call, retries=self.retries, delay=self.delay
            )
        except LookupTransportError:
            if raise_transport:
                # batch_lookup needs to tell "network down" apart from "API
                # answered empty" — caching the former as no_candidates
                # would permanently suppress the lookup
                raise
            return []  # reference contract: network failures degrade to []
        if status == 401:
            raise LookupAuthError("invalid API key for company lookup")
        if status == 429:
            raise LookupRateLimitError("company lookup rate limit exceeded")
        if status >= 400:
            raise LookupHTTPError(f"company lookup API error {status}: {body[:200]}")
        try:
            data = json.loads(body)
        except ValueError:
            return []
        if not isinstance(data, dict):
            return []
        payload = data.get("data")
        if payload is None and isinstance(data.get("value"), dict):
            payload = data["value"].get("data")
        return payload if isinstance(payload, list) else []


def batch_lookup(
    pending: DataFrame,
    client_factory: Callable[[], CompanyLookupClient],
    cache: DataFrame | None = None,
    name_col: str = "name",
    limit: int = DEFAULT_LIMIT,
) -> DataFrame:
    """Executor-side batched candidate fetch for every distinct pending
    name not already in the cache table.

    Returns a CANDIDATE_SCHEMA DataFrame: ≥1 row per looked-up name
    (``lookup_status`` = 'ok' with candidate fields, 'no_candidates' with
    NULLs — the row that makes the cache append idempotent — or
    'transport_error' when the network failed after retries). Union it
    with ``cache`` for matching; persist it so reruns skip the API.
    Transport-error rows are EXCLUDED from the skip set, so those names
    are re-fetched on the next run instead of being silently lost.
    """
    names = pending.select(
        F.trim(F.col(name_col)).alias("search_name")
    ).where(F.col("search_name").isNotNull() & (F.col("search_name") != ""))
    names = names.distinct()
    if cache is not None:
        done = cache.where(F.col("lookup_status") != "transport_error")
        names = names.join(
            done.select("search_name").distinct(), "search_name", "left_anti"
        )

    def fetch(batches: Iterator) -> Iterator:
        import pandas as pd

        client = client_factory()  # one client per executor task
        for pdf in batches:
            out: list[tuple] = []
            for q in pdf["search_name"]:
                try:
                    cands = client.search_company(q, limit=limit, raise_transport=True)
                except LookupTransportError:
                    out.append((q, None, None, None, None, "transport_error"))
                    continue
                if not cands:
                    out.append((q, None, None, None, None, "no_candidates"))
                    continue
                for c in cands:
                    # provider fields are untrusted: a non-numeric rating
                    # must degrade to NULL, not abort the Spark task
                    try:
                        rating = float(c.get("rating"))
                    except (TypeError, ValueError):
                        rating = None
                    try:
                        reviews = int(c.get("review_count"))
                    except (TypeError, ValueError):
                        reviews = None
                    name_val = c.get("name")
                    out.append(
                        (
                            q,
                            str(c.get("company_id")) if c.get("company_id") is not None else None,
                            str(name_val) if name_val is not None else None,
                            rating,
                            reviews,
                            "ok",
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "search_name",
                    "candidate_id",
                    "candidate_name",
                    "candidate_rating",
                    "candidate_review_count",
                    "lookup_status",
                ],
            )

    # fetch references module-level names (LookupTransportError, the
    # client factory) by reference — workers must import the package
    from job_etl_spark.shipping import ensure_worker_package

    ensure_worker_package(names.sparkSession)
    return names.mapInPandas(fetch, schema=CANDIDATE_SCHEMA)
