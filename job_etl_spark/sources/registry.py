"""YAML-driven source registry (reference parity: S3,
``services/source_extractor/source_config.py:36-98``; format
``config/sources.yml``):

    sources:
      jsearch: {adapter: jsearch, enabled: true, params: {max_jobs: 20}}
      mock:    {adapter: mock, enabled: false, params: {}}
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

from job_etl_spark.sources.base import SourceAdapter
from job_etl_spark.sources.jsearch_adapter import JSearchAdapter
from job_etl_spark.sources.mock_adapter import MockAdapter

ADAPTERS: dict[str, type] = {"jsearch": JSearchAdapter, "mock": MockAdapter}


@dataclass
class ProviderConfig:
    name: str
    adapter: str
    enabled: bool = True
    params: dict[str, Any] = field(default_factory=dict)

    def build(self) -> SourceAdapter:
        cls = ADAPTERS.get(self.adapter)
        if cls is None:
            raise ValueError(f"unknown adapter {self.adapter!r}; have {sorted(ADAPTERS)}")
        return cls(**self.params)


def load_sources_config(path: str | Path) -> dict[str, ProviderConfig]:
    with Path(path).open("r", encoding="utf-8") as fh:
        loaded = yaml.safe_load(fh) or {}
    out: dict[str, ProviderConfig] = {}
    for name, cfg in (loaded.get("sources") or {}).items():
        cfg = cfg or {}
        out[name] = ProviderConfig(
            name=name,
            adapter=cfg.get("adapter", name),
            enabled=bool(cfg.get("enabled", True)),
            params=dict(cfg.get("params") or {}),
        )
    return out
