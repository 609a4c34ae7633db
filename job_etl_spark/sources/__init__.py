"""Source adapters and raw landing (reference parity: S1-S4, S10-S13)."""

from job_etl_spark.sources.base import JobPostingRaw, SourceAdapter
from job_etl_spark.sources.mock_adapter import MockAdapter
from job_etl_spark.sources.registry import load_sources_config

__all__ = ["JobPostingRaw", "SourceAdapter", "MockAdapter", "load_sources_config"]
