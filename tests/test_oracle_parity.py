"""Every declared query must match its DuckDB oracle twin — the local,
stricter replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from job_etl_spark.queries import registry
from job_etl_spark.testing import check_query
from tests.conftest import SF_ORACLE

_REG = registry()


@pytest.mark.parametrize("name", sorted(_REG))
def test_query_matches_oracle(spark, name):
    q = _REG[name]
    res = check_query(spark, SF_ORACLE, name, q.fn, q.oracle)
    assert res.ok, f"{name}: {res.detail}"
