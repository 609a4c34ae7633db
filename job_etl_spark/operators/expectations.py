"""Declarative data-quality expectations — the single-pass constraint
verifier (Deequ-style) behind the DQ report surface.

A ``Check`` declares a metric (an aggregate expression over the table)
plus a [lo, hi] acceptance band. ``dq_report`` computes EVERY declared
metric in ONE aggregation pass over the table — at 100 TB the report
costs one scan regardless of how many constraints are declared (exact
uniqueness adds its distinct's shuffle; everything else rides the same
partial agg) — then reshapes the single metrics row into the long
(check, value, passed) frame a quality dashboard consumes.

The reshape is a map-side explode of a literal struct array over the
1-row aggregate — no unpivot shuffle, no per-check jobs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    """One declared expectation: an aggregate metric and its accept band.

    ``metric`` must be an aggregate Column producing a DOUBLE (ratios via
    exact decimal division, rounded — see queries._util parity rules);
    ``sql_metric`` is its ANSI-SQL twin for the oracle.
    """

    name: str
    metric: Column | None  # None for oracle-side-only instances
    sql_metric: str
    lo: float
    hi: float


def dq_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """(check, value, passed) — all metrics from one aggregation pass."""
    agg = df.agg(*[c.metric.alias(c.name) for c in checks])
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.col(c.name).alias("value"),
                F.lit(c.lo).alias("_lo"),
                F.lit(c.hi).alias("_hi"),
            )
            for c in checks
        ]
    )
    out = agg.select(F.explode(rows).alias("r")).select("r.*")
    return out.select(
        "check",
        "value",
        ((F.col("value") >= F.col("_lo")) & (F.col("value") <= F.col("_hi"))).alias(
            "passed"
        ),
    )


def dq_report_sql(table: str, checks: list[Check]) -> str:
    """DuckDB oracle twin: same one-pass aggregate, same long reshape."""
    metrics = ",\n    ".join(f"{c.sql_metric} AS {c.name}" for c in checks)
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c.name}' AS check, {c.name} AS value, "
        f"{c.name} >= {c.lo} AND {c.name} <= {c.hi} AS passed FROM m"
        for c in checks
    )
    return f"WITH m AS (\n  SELECT {metrics}\n  FROM {table}\n)\n{arms}"
