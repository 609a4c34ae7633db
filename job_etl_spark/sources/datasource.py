"""Custom Python DataSource: distributed paginated REST ingest (S1 scale path).

The reference's extract task is a driver-side page loop
(``services/source_extractor/adapters/jsearch_adapter.py:186-269`` +
``airflow/dags/jobs_etl_daily.py:559-674``) — fine for 20 jobs/day, a
bottleneck at scale. SURVEY.md §2.1/S1 names the scale path: a custom
Python DataSource (``spark.dataSource.register``) so page ranges fan out
across executors.

Page-number tokens make pages independently addressable, so the planner
splits ``[0, num_pages)`` into contiguous page-range partitions; each
executor instantiates the adapter locally and drains only its range. The
driver never touches a payload, ingest parallelism scales with the
cluster, and per-partition retry (the adapter's backoff, U8) localizes
provider hiccups to one task.

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

        return JSearchAdapter(
            api_key=opts.get("api_key", ""),
            query=opts.get("query", "data engineer"),
            max_jobs=int(opts.get("max_jobs", 20)),
        )
    raise ValueError(f"unknown adapter {kind!r}")


class JobsRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
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
        adapter = _build_adapter(self.options)
        collected_at = dt.datetime.fromisoformat(
            self.options.get("collected_at") or dt.datetime.now().isoformat()
        )
        page = partition.start_page
        while page < partition.end_page:
            jobs, next_token = adapter.fetch(str(page) if page else None)
            for j in jobs:
                # deterministic raw_id: replayed partitions land identical
                # rows, so the downstream hash-key merge stays idempotent
                rid = str(
                    uuid.uuid5(
                        uuid.NAMESPACE_URL, f"{j.source}/{j.provider_job_id}"
                    )
                )
                yield (
                    rid,
                    j.source,
                    json.dumps(j.payload, sort_keys=True),
                    collected_at,
                )
            if next_token is None:
                break
            page = int(next_token)


class JobsRestStreamReader:
    """SimpleDataSourceStreamReader: continuous REST ingest. The offset is
    the next unread page number, so micro-batches are contiguous page
    ranges — restart-safe (offsets live in the checkpoint log) and
    replayable (``readBetweenOffsets`` re-fetches the exact range).
    Pages that don't exist yet simply yield an empty batch; the query
    keeps polling — the streaming twin of the batch page-range reader."""

    def __init__(self, options: dict):
        self.options = dict(options)
        self._pages_per_batch = max(1, int(self.options.get("pages_per_batch", 2)))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _rows_for(self, start_page: int, end_page: int):
        adapter = _build_adapter(self.options)
        collected_at = dt.datetime.fromisoformat(
            self.options.get("collected_at") or dt.datetime.now().isoformat()
        )
        page = start_page
        while page < end_page:
            jobs, next_token = adapter.fetch(str(page) if page else None)
            for j in jobs:
                rid = str(
                    uuid.uuid5(uuid.NAMESPACE_URL, f"{j.source}/{j.provider_job_id}")
                )
                yield (rid, j.source, json.dumps(j.payload, sort_keys=True), collected_at)
            if next_token is None:
                return
            page = int(next_token)

    def read(self, start: dict):
        start_page = start["page"]
        end_page = start_page + self._pages_per_batch
        rows = list(self._rows_for(start_page, end_page))
        if not rows:
            return iter(()), start  # source drained: offset unchanged
        return iter(rows), {"page": end_page}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows_for(start["page"], end["page"])

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
