"""Relational operator library — the engine's reusable building blocks.

merge        — COALESCE-merge upsert (J3/J5), insert-if-absent (J4)
dedup_window — DISTINCT ON keep-first/keep-last (A4)
topk         — order-by + limit planned as TakeOrderedAndProject (O1)
watermark    — high-watermark incremental predicates (A5/P4)
dq           — data-quality checks (dbt-test equivalents: unique, not_null,
               accepted_values, relationships)
"""

from job_etl_spark.operators.merge import insert_if_absent, merge_upsert
from job_etl_spark.operators.dedup_window import distinct_on
from job_etl_spark.operators.topk import top_k
from job_etl_spark.operators.watermark import high_watermark, incremental_filter

__all__ = [
    "merge_upsert",
    "insert_if_absent",
    "distinct_on",
    "top_k",
    "high_watermark",
    "incremental_filter",
]
