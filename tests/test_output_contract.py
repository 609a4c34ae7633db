"""Registry-wide driver output contract.

The driver canonicalizes both result sets through pandas: it crashes on
unhashable cells (array/map/struct columns) and hash-mismatches when the
two engines land on different pandas dtypes for the same column (DuckDB
SUM(BIGINT) -> HUGEINT -> float64 vs Spark's int64 — the r02 q93/q98
failure class). This gate is schema-only (no query execution) so it runs
in seconds and fails the moment a new query re-introduces either bug.
"""

from __future__ import annotations

import pytest

from job_etl_spark.queries import registry
from job_etl_spark.testing import duck_connection
from tests.conftest import SF_ORACLE

INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
INT_DUCK = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}

_REG = registry()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_REG))
def test_output_contract(spark, duck, name):
    q = _REG[name]
    sdf = q.fn(spark, SF_ORACLE)
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    problems = []
    for col, t in spark_types.items():
        if t.startswith(("array", "map", "struct")):
            problems.append(f"spark col {col} is {t} (unhashable in driver canon)")
        if t.startswith("decimal"):
            problems.append(
                f"spark col {col} is {t} (pandas renders Decimal objects; "
                "DuckDB HUGEINT/DECIMAL lands on float64 — q134 class)"
            )
    if q.oracle is not None:
        desc = duck.execute(f"DESCRIBE ({q.oracle})").fetchall()
        for col, dtype, *_ in desc:
            dt_up = dtype.upper()
            st = spark_types.get(col)
            if dt_up.startswith(("STRUCT", "MAP")) or dt_up.endswith("[]"):
                problems.append(f"oracle col {col} is {dtype} (unhashable in driver canon)")
            if st in INT_SPARK and dt_up not in INT_DUCK:
                problems.append(
                    f"oracle col {col} is {dtype} but spark is {st} (pandas dtype mismatch)"
                )
            if st == "double" and dt_up != "DOUBLE":
                problems.append(
                    f"oracle col {col} is {dtype} but spark is {st} (pandas dtype mismatch)"
                )
    assert not problems, f"{name}: " + "; ".join(problems)


def test_bench_headline_covers_registry():
    """Every declared query is benchmarked unless explicitly excluded —
    a new query that forgets to register in bench.HEADLINE fails here
    instead of silently missing from BENCH_HISTORY."""
    import bench

    # fast sub-second queries whose work is fully covered by a benched
    # superset query (kept out of HEADLINE to keep the suite's wall-clock
    # signal concentrated on distinct execution shapes)
    excluded = {
        "q04_priority_stats",
        "q06_customers_without_orders",
        "q07_active_customers_by_segment",
        "q10_union_sources",
        "q16_normalize_semantics",
        "q17_fuzzy_match",
        "q22_quality_score",
        "q23_lang_id",
        "q28_multimodal_bytes",
        "q30_simhash",
        "q35_approx_distinct",
    }
    reg = set(_REG)
    head = set(bench.HEADLINE)
    assert head <= reg, f"headline entries not in registry: {sorted(head - reg)}"
    missing = reg - head - excluded
    assert not missing, f"registry queries missing from bench.HEADLINE: {sorted(missing)}"
