"""Driver contract for the jobspark engine.

``entry(spark)`` runs the flagship query (the reference's ranked top-k
digest analog, SURVEY.md §3.1 step 9) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the declared operator inventory
(``job_etl_spark/queries/``) for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the package lives next to this file; make the import independent of the
# driver's cwd / import mechanism
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from job_etl_spark.queries import registry  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from job_etl_spark.queries.domain import q19_rank_top25

    return q19_rank_top25(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
