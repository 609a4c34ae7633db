"""Numeric semantics (reference parity: U2 pieces).

Safe numeric parse (``services/normalizer/normalize.py:288-319``): str/int/
float → double, invalid → NULL. Spark's ``cast('double')`` returns NULL on
failure — identical semantics, fully native.

Salary-bound swap (``normalize.py:125-135``): if min > max, swap before
storing — ``least``/``greatest``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_double_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # try_cast: NULL on failure even under Spark 4's default ANSI mode —
    # same semantics as the reference's warn-and-return-None parse
    return c.try_cast("double")


def salary_bounds_exprs(mn: Column | str, mx: Column | str) -> tuple[Column, Column]:
    """Return (salary_min, salary_max) with the swap applied only when both
    bounds are present and inverted; single-sided bounds pass through."""
    a = F.col(mn) if isinstance(mn, str) else mn
    b = F.col(mx) if isinstance(mx, str) else mx
    both = a.isNotNull() & b.isNotNull()
    lo = F.when(both, F.least(a, b)).otherwise(a)
    hi = F.when(both, F.greatest(a, b)).otherwise(b)
    return lo, hi
