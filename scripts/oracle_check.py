"""Oracle parity for NAMED queries at one or all SFs — the per-change
correctness gate for optimization work (driver_rehearsal.py checks the
whole registry; this isolates the queries a change touched).

Usage: python scripts/oracle_check.py q158 q101 [--sf DIR ...]
       (default: all of sf0.001, sf0.01, sf0.1)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from driver_rehearsal import TABLES, canon  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf",
        action="append",
        default=None,
        help="sf dir (repeatable); default all three",
    )
    args = ap.parse_args()
    sfs = args.sf or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = []
    for prefix in args.queries:
        from _resolve import resolve_query

        names.append(resolve_query(qs, prefix))

    bad = 0
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            try:
                spdf = qs[name](spark, sf).toPandas()
                sql = osql.get(name)
                if sql is None:
                    print(f"{sf} {name}: rows-only {len(spdf)}")
                    continue
                dpdf = con.execute(sql).df()
                good = list(spdf.columns) == list(dpdf.columns) and canon(spdf) == canon(
                    dpdf
                )
                print(f"{sf} {name}: {'OK' if good else 'FAIL'} ({len(spdf)} rows)")
                bad += 0 if good else 1
            except Exception as ex:  # noqa: BLE001
                bad += 1
                print(f"{sf} {name}: ERR {type(ex).__name__}: {str(ex)[:200]}")
        con.close()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
