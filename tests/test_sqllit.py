"""functions/sqllit.py: rendered SQL literals must evaluate bit-identically
to the per-element ``F.lit`` construction they replaced (ml/ann.py
codebooks/planes, ml/dedup.py coefficient arrays, q158's per-dim means).
"""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from job_etl_spark.functions.sqllit import (
    lit_bigint_array,
    lit_double_array,
    sql_double,
    sql_int,
)


def _bits(x):
    return struct.pack(">d", x)


@given(
    st.floats(allow_nan=True, allow_infinity=True, allow_subnormal=True)
)
@settings(max_examples=300, deadline=None)
def test_sql_double_renders_roundtrippable_text(x):
    # driver-side check: the rendered text inside CAST('…' AS DOUBLE)
    # must round-trip through float() to the identical bits (Java's
    # Double.parseDouble is correctly rounded like Python's float())
    s = sql_double(x)
    inner = s.split("'")[1]
    back = float(inner)
    if math.isnan(x):
        assert math.isnan(back)
    else:
        assert _bits(back) == _bits(x)


EDGE = [
    0.0, -0.0, 1.0, -1.0, 0.1, 1 / 3, 5e-324, 2**-1074, 1e-300,
    1.7976931348623157e308, -1.7976931348623157e308, 123456789.123456789,
    float("inf"), float("-inf"), float("nan"), 1e-9, -2.5e17,
]


def test_lit_double_array_matches_per_element_lits(spark):
    rendered = spark.range(1).select(lit_double_array(EDGE).alias("a")).collect()[0][0]
    element = (
        spark.range(1)
        .select(F.array(*[F.lit(x) for x in EDGE]).alias("a"))
        .collect()[0][0]
    )
    assert len(rendered) == len(element) == len(EDGE)
    for r, e in zip(rendered, element):
        if math.isnan(e):
            assert math.isnan(r)
        else:
            assert _bits(r) == _bits(e)


def test_lit_double_array_null_passthrough(spark):
    got = spark.range(1).select(
        lit_double_array([1.5, None, -0.0]).alias("a")
    ).collect()[0][0]
    assert got[1] is None and _bits(got[2]) == _bits(-0.0)


def test_lit_bigint_array_matches_casted_lits(spark):
    vals = [0, 1, -1, 2**62, -(2**62), 123456789012345]
    rendered = spark.range(1).select(lit_bigint_array(vals).alias("a")).collect()[0][0]
    element = (
        spark.range(1)
        .select(F.array(*[F.lit(v).cast("bigint") for v in vals]).alias("a"))
        .collect()[0][0]
    )
    assert rendered == element == vals
    schema = spark.range(1).select(lit_bigint_array(vals).alias("a")).schema
    assert schema["a"].dataType.simpleString() == "array<bigint>"


def test_sql_int_widening_matches_pyspark_lit(spark):
    # within int32 → INT (like py4j Integer), beyond → BIGINT (like Long)
    small = spark.range(1).select(F.expr(sql_int(7)).alias("x")).schema
    big = spark.range(1).select(F.expr(sql_int(2**40)).alias("x")).schema
    lit_small = spark.range(1).select(F.lit(7).alias("x")).schema
    lit_big = spark.range(1).select(F.lit(2**40).alias("x")).schema
    assert small["x"].dataType == lit_small["x"].dataType
    assert big["x"].dataType == lit_big["x"].dataType


def test_assign_centroid_book_matches_per_element_form(spark):
    # the exact pre-refactor construction of ml/ann._lit_book, kept here
    # as the reference form
    import random

    from job_etl_spark.ml.ann import _lit_book, _py_norm

    rng = random.Random(42)
    cents = [
        (cid, [rng.uniform(-1, 1) * 10 ** rng.randint(-8, 2) for _ in range(16)])
        for cid in range(5)
    ]
    old = F.array(
        *[
            F.struct(
                F.lit(cid).alias("i"),
                F.lit(_py_norm(cvec)).alias("nb"),
                F.array(*[F.lit(x) for x in cvec]).alias("v"),
            )
            for cid, cvec in cents
        ]
    )
    df = spark.range(1)
    a = df.select(old.alias("b")).collect()[0][0]
    b = df.select(_lit_book(cents).alias("b")).collect()[0][0]
    assert len(a) == len(b)
    for ea, eb in zip(a, b):
        assert ea["i"] == eb["i"]
        assert _bits(ea["nb"]) == _bits(eb["nb"])
        assert [_bits(x) for x in ea["v"]] == [_bits(x) for x in eb["v"]]
    sa = df.select(old.alias("b")).schema["b"].dataType.simpleString()
    sb = df.select(_lit_book(cents).alias("b")).schema["b"].dataType.simpleString()
    assert sa == sb


def test_bucket_expr_unchanged_by_rendering(spark):
    # bucket ids over a real embedding sample must match the per-element
    # construction (same IEEE dots, same sign bits)
    from job_etl_spark.ml.ann import _dot, bucket_expr, plane_matrix

    planes = plane_matrix(6, 8)
    df = spark.createDataFrame(
        [([(i * 37 % 19) / 7.0 - 1.2 for i in range(j, j + 8)],) for j in range(40)],
        "vec: array<double>",
    )
    old_mat = F.array(
        *[
            F.struct(
                F.lit(1 << p).alias("w"),
                F.array(*[F.lit(x) for x in plane]).alias("v"),
            )
            for p, plane in enumerate(planes)
        ]
    )
    old_bits = F.transform(
        old_mat,
        lambda e: F.when(_dot(F.col("vec"), e["v"]) > 0, e["w"]).otherwise(F.lit(0)),
    )
    old_bucket = F.aggregate(old_bits, F.lit(0), lambda s, x: s + x)
    got = df.select(
        bucket_expr(F.col("vec"), planes).alias("new"), old_bucket.alias("old")
    ).collect()
    assert all(r["new"] == r["old"] for r in got)


def test_q158_mean_expr_matches_column_form(spark):
    # the rendered per-dim mean aggregate (decimal-exact sum → double
    # divide → decimal round) must equal the Column-built original
    import random

    rng = random.Random(7)
    rows = [([rng.uniform(-2, 2) for _ in range(4)],) for _ in range(100)]
    df = spark.createDataFrame(rows, "vec: array<double>")
    d = 2
    old = (
        F.round(
            (
                F.sum(F.element_at("vec", d + 1).cast("decimal(30,12)")).cast("double")
                / F.count(F.lit(1))
            ).cast("decimal(24,10)"),
            6,
        )
        .cast("double")
        .alias("m")
    )
    new = F.expr(
        "CAST(ROUND(CAST(CAST(SUM(CAST(element_at(vec, "
        f"{d + 1}) AS DECIMAL(30,12))) AS DOUBLE) / COUNT(1) "
        "AS DECIMAL(24,10)), 6) AS DOUBLE)"
    ).alias("m")
    a = df.agg(old).collect()[0][0]
    b = df.agg(new).collect()[0][0]
    assert _bits(a) == _bits(b)


def test_q158_posexplode_means_match_per_dim_aggregate(spark):
    # the r11 round restructure: grouping the mean aggregate by
    # (cid, pos) over a posexplode must reproduce the original 64-wide
    # per-dim aggregate bit-for-bit (same decimal sum, same divide, same
    # round) — COUNT(1) per (cid, pos) == per-cid row count when every
    # vector has the full dimension, which the fixture (and q158's dim
    # assert) guarantees
    import random

    rng = random.Random(11)
    dim = 4
    rows = [
        (rng.randrange(3), [rng.uniform(-2, 2) for _ in range(dim)])
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "cid: int, vec: array<double>")
    mean_sql = (
        "CAST(ROUND(CAST(CAST(SUM(CAST({v} AS DECIMAL(30,12))) AS DOUBLE)"
        " / COUNT(1) AS DECIMAL(24,10)), 6) AS DOUBLE)"
    )
    old = {
        (r["cid"], d): r[f"m{d}"]
        for r in df.groupBy("cid")
        .agg(
            *[
                F.expr(mean_sql.format(v=f"element_at(vec, {d + 1})")).alias(f"m{d}")
                for d in range(dim)
            ]
        )
        .collect()
        for d in range(dim)
    }
    new = {
        (r["cid"], r["pos"]): r["m"]
        for r in df.select("cid", F.posexplode("vec").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(F.expr(mean_sql.format(v="val")).alias("m"))
        .collect()
    }
    assert set(old) == set(new)
    assert all(_bits(old[k]) == _bits(new[k]) for k in old)


def test_cached_expr_memoizes_and_bounds(spark):
    # r11: wide rendered literals are parse-memoized — same text must give
    # the SAME Column object (parse skipped), different text a different
    # one, and the memo must stay bounded under churn
    from job_etl_spark.functions import sqllit as sl

    sl._EXPR_CACHE.clear()
    a1 = sl.cached_expr("array(1, 2, 3)")
    a2 = sl.cached_expr("array(1, 2, 3)")
    b = sl.cached_expr("array(4, 5)")
    assert a1 is a2 and a1 is not b
    # cached Column still evaluates correctly in a fresh plan
    got = spark.range(1).select(a1.alias("xs")).collect()[0]["xs"]
    assert got == [1, 2, 3]
    for i in range(sl._EXPR_CACHE_MAX + 10):
        sl.cached_expr(f"array({i})")
    assert len(sl._EXPR_CACHE) <= sl._EXPR_CACHE_MAX
