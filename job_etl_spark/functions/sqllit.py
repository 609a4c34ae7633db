"""Fast wide-literal construction via rendered SQL.

Building wide float literals with per-element ``F.lit`` costs one py4j
round trip per element: an 8x64 k-means codebook is ~500 driver calls
(~0.7 s measured on local[32]) before Catalyst even sees the plan, and
iterative queries (q158 k-means, q110, q122, PQ/ADC) pay it once per
round. Rendering the same literal as ONE SQL string and parsing it with
``F.expr`` is ~100x cheaper on the driver and yields an identically
evaluating expression.

Bit-exactness: ``CAST('<repr(x)>' AS DOUBLE)`` round-trips every double
bit-for-bit — Python ``repr`` emits the shortest decimal that uniquely
identifies the IEEE value, and Java's ``Double.parseDouble`` (behind
Spark's string→double cast) is correctly rounded, so parse(repr(x)) == x
for all finite doubles, denormals, ±0.0, and full-precision values;
±Infinity/NaN go through their Java spellings. Verified in
``tests/test_sqllit.py`` (hypothesis property + construction-equality
against the per-element ``F.lit`` form).

Integer fields use plain SQL int literals, matching ``F.lit(int)``'s
py4j Integer/Long auto-widening: values within int32 render bare (INT,
like py4j's Integer conversion), wider values render with an ``L``
suffix (BIGINT).
"""

from __future__ import annotations

import math
from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT32_MIN = -(1 << 31)
_INT32_MAX = (1 << 31) - 1


def sql_double(x: float | None) -> str:
    """SQL fragment evaluating to exactly the double ``x`` (or NULL)."""
    if x is None:
        return "CAST(NULL AS DOUBLE)"
    x = float(x)
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
    return f"CAST('{x!r}' AS DOUBLE)"


def sql_int(x: int) -> str:
    """SQL int literal matching ``F.lit(x)``'s Integer/Long widening."""
    x = int(x)
    return str(x) if _INT32_MIN <= x <= _INT32_MAX else f"{x}L"


def sql_bigint(x: int) -> str:
    return f"CAST({int(x)} AS BIGINT)"


def sql_double_array(vals: Iterable[float | None]) -> str:
    return "array(" + ",".join(sql_double(v) for v in vals) + ")"


# Parsed-expression memo for the WIDE rendered literals (plane matrices,
# codebooks): the ANTLR parse of a multi-KB expression costs real driver
# time per call — banded_bucket_expr's 8×4×64 banding text measured
# 0.63 s/parse (r11), paid once per query invocation (twice per bench
# entry). The rendered text fully determines the unresolved expression,
# and a pyspark Column is an immutable session-independent fragment
# (resolution happens later, per plan), so reuse across invocations —
# and across sessions within one JVM gateway — is safe. Bounded FIFO so
# per-round codebooks (q158: fresh literals every round) can't grow the
# memo without limit.
#
# Gateway lifecycle (ADVICE r11): a classic-mode Column wraps a py4j
# JavaObject bound to ONE gateway; if the JVM/gateway is replaced
# in-process (SparkContext fully stopped and recreated), every cached
# Column is a dead handle and would fail obscurely on a hit. The memo is
# therefore pinned to the SparkContext identity that parsed it and
# cleared when a different context is active.
_EXPR_CACHE: dict[str, Column] = {}
_EXPR_CACHE_MAX = 128
# weakref (not id(): ids are reused after GC) to the owning SparkContext
_EXPR_CACHE_CTX = None


def cached_expr(sql: str) -> Column:
    """``F.expr(sql)`` with a bounded memo keyed on the exact SQL text,
    valid for the lifetime of the active SparkContext."""
    global _EXPR_CACHE_CTX
    import weakref

    from pyspark import SparkContext

    ctx = SparkContext._active_spark_context
    if ctx is None:
        # no live context: parse fresh (a memoized handle could outlive
        # whatever context the caller is about to create)
        return F.expr(sql)
    if _EXPR_CACHE_CTX is None or _EXPR_CACHE_CTX() is not ctx:
        _EXPR_CACHE.clear()
        _EXPR_CACHE_CTX = weakref.ref(ctx)
    col = _EXPR_CACHE.get(sql)
    if col is None:
        if len(_EXPR_CACHE) >= _EXPR_CACHE_MAX:
            _EXPR_CACHE.pop(next(iter(_EXPR_CACHE)))
        col = F.expr(sql)
        _EXPR_CACHE[sql] = col
    return col


def lit_double_array(vals: Iterable[float | None]) -> Column:
    """array<double> literal — one driver call regardless of width."""
    return cached_expr(sql_double_array(vals))


def lit_bigint_array(vals: Iterable[int]) -> Column:
    return cached_expr("array(" + ",".join(sql_bigint(v) for v in vals) + ")")
