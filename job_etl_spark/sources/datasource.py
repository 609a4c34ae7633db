"""Custom Python DataSource: distributed paginated REST ingest (S1 scale path).

The reference's extract task is a driver-side page loop
(``services/source_extractor/adapters/jsearch_adapter.py:186-269`` +
``airflow/dags/jobs_etl_daily.py:559-674``) — fine for 20 jobs/day, a
bottleneck at scale. SURVEY.md §2.1/S1 names the scale path: a custom
Python DataSource (``spark.dataSource.register``) so page ranges fan out
across executors.

Pages are independently addressable via ``SourceAdapter.page_token(idx)``
(0-based indices; 1-based providers translate), so the planner splits
``[0, num_pages)`` into contiguous page-range partitions and each
executor fetches ONLY its indices — never following the sequential
next_token chain, whose adapter-local bookkeeping (e.g. jsearch's
cumulative max_jobs gate) resets per partition. The driver never touches
a payload; per-partition retry (the adapter's backoff, U8) localizes
provider hiccups to one task.

Determinism: ``collected_at`` resolves ONCE on the driver (a per-task
``now()`` would stamp each partition/retry differently and split one
logical load across watermarks), and raw_id is an order-carrying
deterministic id — fixed-width ``page·10⁶+seq`` prefix (so lexicographic
raw_id order == fetch order; the within-batch last-row-wins dedup relies
on it) + a uuid5 of (source, provider_job_id) (so replayed partitions
land identical rows and the hash-key merge stays idempotent).

Usage:
    spark.dataSource.register(JobsRestDataSource)
    df = (spark.read.format("jobs_rest")
          .option("adapter", "mock").option("num_jobs", 100)
          .option("collected_at", "2026-01-01T07:00:00").load())
"""

from __future__ import annotations

import datetime as dt
import json
import uuid

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# DDL twin of schema.RAW_SCHEMA (kept as a string so executors don't need
# the pyspark StructType import path at deserialization time)
_RAW_DDL = "raw_id string, source string, payload string, collected_at timestamp"


class PageRange(InputPartition):
    def __init__(self, start_page: int, end_page: int):
        self.start_page = start_page
        self.end_page = end_page  # exclusive


def _build_adapter(opts: dict):
    kind = opts.get("adapter", "mock")
    if kind == "mock":
        from job_etl_spark.sources.mock_adapter import MockAdapter

        return MockAdapter(
            num_jobs=int(opts.get("num_jobs", 100)),
            jobs_per_page=int(opts.get("jobs_per_page", 20)),
        )
    if kind == "jsearch":
        from job_etl_spark.sources.jsearch_adapter import JSearchAdapter

        # the page-range planner (num_jobs) bounds the work; the adapter's
        # own cumulative gate is per-instance and would re-arm per
        # partition, so it must not bite here
        return JSearchAdapter(
            api_key=opts.get("api_key", ""),
            query=opts.get("query", "data engineer"),
            max_jobs=1 << 31,
        )
    raise ValueError(f"unknown adapter {kind!r}")


def _resolve_collected_at(opts: dict) -> str:
    """ISO string; called on the DRIVER exactly once per reader."""
    return opts.get("collected_at") or dt.datetime.now(dt.timezone.utc).replace(
        tzinfo=None
    ).isoformat()


def _row_id(page_idx: int, seq: int, source: str, provider_job_id) -> str:
    det = uuid.uuid5(uuid.NAMESPACE_URL, f"{source}/{provider_job_id}").hex[:16]
    return f"{page_idx * 1_000_000 + seq:014d}-{det}"


def _fetch_range(opts: dict, collected_at_iso: str, start_page: int, end_page: int):
    """Yield raw rows for pages [start_page, end_page); stops early when
    the provider drains (an empty page). Returns the number of pages
    actually consumed via StopIteration value — callers that need it use
    the generator protocol; plain iteration just gets the rows."""
    adapter = _build_adapter(opts)
    collected_at = dt.datetime.fromisoformat(collected_at_iso)
    consumed = 0
    for idx in range(start_page, end_page):
        jobs, _ = adapter.fetch(adapter.page_token(idx))
        if not jobs:
            break
        consumed += 1
        for seq, j in enumerate(jobs):
            yield (
                _row_id(idx, seq, j.source, j.provider_job_id),
                j.source,
                json.dumps(j.payload, sort_keys=True),
                collected_at,
            )
    return consumed


class JobsRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self._collected_at = _resolve_collected_at(self.options)
        jobs_per_page = int(self.options.get("jobs_per_page", 20))
        total = int(self.options.get("num_jobs", 100))
        pages = max(1, -(-total // jobs_per_page))
        per_part = max(1, int(self.options.get("pages_per_partition", 4)))
        self._ranges = [
            PageRange(p, min(p + per_part, pages)) for p in range(0, pages, per_part)
        ]

    def partitions(self):
        return self._ranges

    def read(self, partition: PageRange):
        yield from _fetch_range(
            self.options, self._collected_at, partition.start_page, partition.end_page
        )


class JobsRestStreamReader:
    """SimpleDataSourceStreamReader: continuous REST ingest. The offset is
    the next unread page number, so micro-batches are contiguous page
    ranges — restart-safe (offsets live in the checkpoint log) and
    replayable (``readBetweenOffsets`` re-fetches the exact range). The
    committed offset advances only over pages ACTUALLY consumed: when the
    source drains mid-range the remaining indices stay unread, so pages
    published later are still ingested (page-level granularity — a page
    must be complete when first read)."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self._pages_per_batch = max(1, int(self.options.get("pages_per_batch", 2)))
        self._collected_at = _resolve_collected_at(self.options)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        start_page = start["page"]
        gen = _fetch_range(
            self.options, self._collected_at, start_page, start_page + self._pages_per_batch
        )
        rows = []
        while True:
            try:
                rows.append(next(gen))
            except StopIteration as stop:
                consumed = stop.value or 0
                break
        if not rows:
            return iter(()), start  # source drained: offset unchanged
        return iter(rows), {"page": start_page + consumed}

    def readBetweenOffsets(self, start: dict, end: dict):
        return _fetch_range(self.options, self._collected_at, start["page"], end["page"])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: pages are immutable on the provider


class JobsRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jobs_rest"

    def schema(self) -> str:
        return _RAW_DDL

    def reader(self, schema) -> JobsRestReader:
        return JobsRestReader(self.options)

    def simpleStreamReader(self, schema) -> JobsRestStreamReader:
        return JobsRestStreamReader(self.options)
