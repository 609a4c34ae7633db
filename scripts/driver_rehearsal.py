"""Dress-rehearse the driver's correctness gate exactly: vanilla
SparkSession (no get_spark tuning), the __spark_entry__ contract, DuckDB
views over the same parquet, and the driver's pandas canonicalization
(sort_values over all columns + dtype-sensitive cell rendering — the
channel where HUGEINT→float64 and list cells fail).

Usage: python scripts/driver_rehearsal.py [--sf DIR] [--window N | --all]
  --window N  check only the first N registry entries (the driver checks 50)
  --all       check every declared query (default)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return [
        tuple(f"{type(v).__name__}:{v}" for v in r)
        for r in pdf.itertuples(index=False, name=None)
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--all", action="store_true", help="check every query (the default)")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)[: args.window] if args.window else list(qs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    ok = bad = 0
    for name in names:
        try:
            spdf = qs[name](spark, args.sf).toPandas()
            sql = osql.get(name)
            if sql is None:
                print(f"{name}: rows-only {len(spdf)}")
                ok += 1
                continue
            dpdf = con.execute(sql).df()
            good = list(spdf.columns) == list(dpdf.columns) and canon(spdf) == canon(dpdf)
            if good:
                ok += 1
            else:
                bad += 1
                print(f"FAIL {name}: cols/values differ ({len(spdf)} vs {len(dpdf)} rows)")
        except Exception as ex:  # noqa: BLE001
            bad += 1
            print(f"ERR {name}: {type(ex).__name__}: {str(ex)[:200]}")
    print(f"RESULT: {ok} ok / {bad} bad of {len(names)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
