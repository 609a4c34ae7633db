"""Registry-wide output-contract audit.

Finds every query whose output the driver's pandas canonicalizer cannot
hash correctly:

- Spark output columns typed array/map/struct (pandas lists are unhashable
  -> driver crash, CORRECTNESS q18/q98/q100 in r02);
- DuckDB oracle columns typed HUGEINT/UHUGEINT/DECIMAL where the Spark twin
  is an integer type (pandas renders HUGEINT as float64/object -> value
  hash mismatch, CORRECTNESS q93 in r02);
- DuckDB LIST/STRUCT/MAP outputs (same unhashable-list crash).

Schema-only: Spark plans are never executed, DuckDB uses DESCRIBE.
Run: python scripts/audit_output_contract.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from job_etl_spark.queries import registry
from job_etl_spark.session import get_spark
from job_etl_spark.testing import duck_connection

INT_SPARK = {"tinyint", "smallint", "int", "bigint"}
INT_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def audit(sf_dir: str) -> list[str]:
    spark = get_spark()
    con = duck_connection(sf_dir)
    problems: list[str] = []
    for name, q in sorted(registry().items()):
        try:
            sdf = q.fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: spark build failed: {e}")
            continue
        spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        for col, t in spark_types.items():
            if t.startswith(("array", "map", "struct")):
                problems.append(f"{name}: spark col {col} is {t} (unhashable in driver canon)")
            if t.startswith("decimal"):
                problems.append(f"{name}: spark col {col} is {t} (pandas Decimal-vs-float64 hash trap)")
        if q.oracle is None:
            continue
        try:
            desc = con.execute(f"DESCRIBE ({q.oracle})").fetchall()
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: oracle DESCRIBE failed: {e}")
            continue
        for col, dtype, *_ in desc:
            dt_up = dtype.upper()
            st = spark_types.get(col)
            if dt_up.startswith(("STRUCT", "MAP")) or dt_up.endswith("[]"):
                problems.append(f"{name}: oracle col {col} is {dtype} (unhashable in driver canon)")
            if st in INT_SPARK and dt_up not in INT_DUCK:
                problems.append(
                    f"{name}: oracle col {col} is {dtype} but spark is {st} (pandas dtype mismatch)"
                )
            if st == "double" and dt_up != "DOUBLE":
                problems.append(
                    f"{name}: oracle col {col} is {dtype} but spark is {st} (pandas dtype mismatch)"
                )
    con.close()
    return problems


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    probs = audit(sf)
    for p in probs:
        print(p)
    print(f"-- {len(probs)} problems")
    sys.exit(1 if probs else 0)
