"""Structured Streaming wrappers (SURVEY.md §2.9).

The reference is batch-only; its incremental idioms map directly onto
streaming concepts and this module exposes that equivalence:

- watermark analog (`min_collected_at` margins, dbt MAX(ingested_at)) →
  ``withWatermark`` + windowed aggregation
- hash-key merge-upsert (J3: keep first_seen, bump last_seen) →
  ``foreachBatch`` running the SAME ``merge_upsert`` operator per
  micro-batch — one code path for batch and streaming writes
"""

from job_etl_spark.streaming.pipeline import (
    foreach_batch_merge,
    stream_from_directory,
    stream_normalize,
    windowed_event_stats,
)
from job_etl_spark.streaming.stateful import (
    interval_join_stream,
    session_stats_native,
    sessionize_stateful,
)

__all__ = [
    "stream_from_directory",
    "windowed_event_stats",
    "foreach_batch_merge",
    "stream_normalize",
    "session_stats_native",
    "sessionize_stateful",
    "interval_join_stream",
]
