"""Declared query inventory — the engine's correctness surface.

Each entry pairs a PySpark implementation with a DuckDB oracle SQL twin
(ANSI SQL over the same parquet tables). The driver runs both at sf0.01
and compares row count + schema + order-insensitive value hash, so every
query here follows the parity rules in ``queries._util``:

- aggregates of doubles go through exact DECIMAL arithmetic, then a final
  cast to double (bit-exact across engines; raw double SUM is
  order-dependent and raw ``round(double)`` differs between engines);
- instant timestamps (events.ts) are emitted as epoch-microsecond BIGINTs;
  TIMESTAMP_NTZ columns (TPC-H dates) are emitted raw;
- every LIMIT is preceded by a total order (unique tie-break column);
- arrays are sorted + de-duplicated before output.
"""

from __future__ import annotations

from job_etl_spark.queries._util import Query
from job_etl_spark.queries import relational, domain, lifedata


def registry() -> dict[str, Query]:
    reg: dict[str, Query] = {}
    for mod in (relational, domain, lifedata):
        for name, q in mod.QUERIES.items():
            if name in reg:
                raise ValueError(f"duplicate query name {name}")
            reg[name] = q
    return reg
