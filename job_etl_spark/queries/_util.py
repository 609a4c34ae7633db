"""Parity helpers shared by the query inventory.

Cross-engine determinism rules (empirically verified against DuckDB 1.0):

- ``SUM(double)`` is accumulation-order-dependent → cast each addend to
  DECIMAL(30,6) first (double→decimal cast is correctly-rounded and
  identical in both engines), sum exactly, round, then cast to double.
- ``ROUND(double, n)`` differs between engines (Spark rounds the shortest
  decimal repr, DuckDB the binary value) → only ever round DECIMALs.
- Per-row double arithmetic (+,-,*,/) is IEEE-deterministic and safe.
- **Never divide a DECIMAL (or a COUNT cast to DECIMAL) by an integer**:
  Spark rounds the exact rational while DuckDB's ``/`` falls to DOUBLE,
  so an exact .5 at the round digit flips between engines (hit in the
  wild by q154; reproduced: Spark 1e-06 vs DuckDB 0.0). Averages go
  decimal-exact-sum → cast DOUBLE → IEEE divide → decimal-round — the
  form ``davg``/``sql_davg`` implement.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(30,6)"


@dataclass
class Query:
    """A declared query: Spark impl + DuckDB oracle twin (None → the driver
    records a weaker rows-only check; reserved for non-SQL-expressible ops)."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    note: str = ""


def dsum(c: Column, scale: int = 2) -> Column:
    """Order-independent, engine-exact sum of a double column."""
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def davg(c: Column, scale: int = 6) -> Column:
    """Engine-exact average: exact decimal sum → IEEE-double division by
    the non-null count → decimal round (see module docstring: a raw
    decimal÷count rounds differently in Spark vs DuckDB)."""
    return (
        F.round(
            (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("decimal(24,10)"),
            scale,
        )
        .cast("double")
    )


def dround(c: Column, scale: int = 2) -> Column:
    """Engine-exact rounding of a per-row double expression."""
    return F.round(c.cast("decimal(24,10)"), scale).cast("double")


def py_dround(x: float | None, scale: int = 2) -> float | None:
    """Driver-side bit-exact replica of ``dround`` for bounded collected
    values (e.g. q162's greedy loop). Spark's double→DECIMAL cast goes
    through the shortest round-trip decimal repr (java BigDecimal.valueOf
    → Double.toString), which ``repr(float)`` reproduces; changePrecision
    and ROUND both use HALF_UP. Property-tested against the Spark
    expression in tests/test_property.py."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if x is None or math.isnan(x) or math.isinf(x):
        return None  # cast to decimal yields NULL (NaN/Inf → NULL even under ANSI)
    if abs(x) >= 1e14:
        # DECIMAL(24,10) holds < 1e14; under ANSI (Spark 4 default) the
        # cast THROWS rather than nulling — mirror that, don't diverge
        raise ValueError(f"py_dround: {x!r} overflows DECIMAL(24,10) (ANSI cast error)")
    d = Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-10), rounding=ROUND_HALF_UP
    )
    d = d.quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP)
    return float(d)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(30,6))), {scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return (
        f"CAST(ROUND(CAST(CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS DECIMAL(24,10)), {scale}) AS DOUBLE)"
    )


def sql_dround(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(CAST({expr} AS DECIMAL(24,10)), {scale}) AS DOUBLE)"
