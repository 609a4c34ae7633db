"""Data-quality checks — dbt schema tests as DataFrame assertions.

The reference runs dbt tests (unique, not_null, accepted_values,
relationships) as a pipeline gate (``dbt/job_dbt/models/marts/schema.yml``,
``airflow/dags/jobs_etl_daily.py:413-556``). Each check here returns a
DataFrame of violating rows — count()==0 means pass — so the checks are
distributed aggregations, never driver-side row loops.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_unique(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    return (
        df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
    )


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    return df.where(F.col(col).isNull())


def check_accepted_values(df: DataFrame, col: str, values: Sequence[str]) -> DataFrame:
    """dbt accepted_values semantics: NULL is NOT a violation (nullability
    is the separate not_null test) — only non-NULL out-of-domain values."""
    return df.where(F.col(col).isNotNull() & ~F.col(col).isin(list(values)))


def check_relationships(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
    """FK violations: child keys with no parent (left_anti; parent side is
    broadcast when small — the dim tables always are)."""
    return (
        child.where(F.col(child_key).isNotNull())
        .join(parent.select(F.col(parent_key).alias(child_key)).distinct(), child_key, "left_anti")
    )


@dataclass
class DQResult:
    name: str
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def run_checks(checks: dict[str, DataFrame]) -> list[DQResult]:
    return [DQResult(name, df.count()) for name, df in checks.items()]
