"""Local oracle-parity harness — replicates the driver's correctness gate
(row count + column names + order-insensitive value comparison against a
DuckDB twin), but STRICTER: values must compare exactly equal after type
normalization, so anything that passes here passes any laxer hash check.
"""

from __future__ import annotations

import datetime as dt
import math
from dataclasses import dataclass

import duckdb

from job_etl_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v
    if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
        return dt.datetime(v.year, v.month, v.day)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, float) and math.isnan(v):
        return ("__nan__",)  # sentinel tuple: cannot collide with a real varchar
    # exact float equality is intentional — parity rules make both engines
    # produce identical doubles
    return v


def _key(row):
    return str(row)


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""


def check_query(spark, sf_dir: str, name: str, fn, oracle: str | None) -> ParityResult:
    sdf = fn(spark, sf_dir)
    srows = sorted((tuple(_norm(v) for v in r) for r in sdf.collect()), key=_key)
    if oracle is None:
        return ParityResult(name, True, f"rows-only: {len(srows)} rows")
    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracle)
        dcols = [d[0] for d in res.description]
        drows = sorted((tuple(_norm(v) for v in r) for r in res.fetchall()), key=_key)
    finally:
        con.close()
    if sdf.columns != dcols:
        return ParityResult(name, False, f"columns differ: spark={sdf.columns} duck={dcols}")
    if len(srows) != len(drows):
        return ParityResult(name, False, f"row count: spark={len(srows)} duck={len(drows)}")
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            return ParityResult(
                name, False, f"row {i} differs:\n  spark={a!r}\n  duck ={b!r}"
            )
    return ParityResult(name, True, f"{len(srows)} rows match")
