"""Custom-aggregate extension point (the UDAF seam).

The inventory's aggregates are native expressions (the fast path:
JVM-side, whole-stage codegen, partial aggregation). When an aggregate
genuinely can't be expressed natively — a statistical estimator from a
Python library, a model-derived score — this is the sanctioned seam: an
Arrow-batched pandas GROUPED_AGG UDF (one Series per group per batch,
never per-row Python). `tests/test_udaf.py` proves the seam agrees with
the native two-pass computation on a real estimator (trimmed mean).

Scale note: GROUPED_AGG UDFs do NOT do map-side partial aggregation —
every group's values ship to one task. Prefer native expressions or the
sketch family (`operators/sketch.py`) for unbounded groups; this seam is
for bounded-cardinality groups or already-reduced frames.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """groupBy + custom aggregate columns (built via ``pandas_agg``)."""
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )


def pandas_agg(
    fn: Callable, value_col: str, result_type: str = "double"
) -> Column:
    """One custom aggregate column: ``fn(pandas.Series) -> scalar``,
    Arrow-batched per group (PandasUDFType.GROUPED_AGG inferred from the
    Series→scalar signature)."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(fn, result_type)(F.col(value_col))
