"""As-of join operator: edge-case semantics on tiny hand-built frames.

Reference parity target: the reference's point-in-time join
(reference: src/exec/asof_join — behavior only); oracle twin is q37
vs DuckDB's native ASOF JOIN in test_oracle_parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_etl_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_null_and_carry(spark):
    left = _mk(
        spark,
        [("u1", 5, "p1"), ("u1", 15, "p2"), ("u2", 3, "p3")],
        "k string, ts long, pid string",
    )
    right = _mk(
        spark,
        [("u1", 4, 100), ("u1", 10, 200), ("u2", 9, 300)],
        "k string, rts long, v int",
    )
    out = {
        r["pid"]: r["v"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts", value_cols=["v"]
        ).collect()
    }
    # p1@5 -> right@4; p2@15 -> right@10 (latest <=); p3@3 -> nothing precedes
    assert out == {"p1": 100, "p2": 200, "p3": None}


def test_asof_tie_matches_equal_ts(spark):
    left = _mk(spark, [("u1", 10, "p1")], "k string, ts long, pid string")
    right = _mk(spark, [("u1", 10, 7)], "k string, rts long, v int")
    rows = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts", value_cols=["v"]
    ).collect()
    assert rows[0]["v"] == 7  # <= semantics: equal timestamp matches


def test_asof_inner_drops_unmatched(spark):
    left = _mk(
        spark, [("u1", 1, "p1"), ("u1", 9, "p2")], "k string, ts long, pid string"
    )
    right = _mk(spark, [("u1", 5, 1)], "k string, rts long, v int")
    rows = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts", value_cols=["v"],
        how="inner",
    ).collect()
    assert [r["pid"] for r in rows] == ["p2"]


def test_asof_single_shuffle_plan(spark):
    """The scalable claim: one Exchange (on the key), no join blow-up."""
    left = _mk(spark, [("u1", 5, "p1")], "k string, ts long, pid string")
    right = _mk(spark, [("u1", 4, 1)], "k string, rts long, v int")
    plan = (
        asof_join(left, right, key="k", left_ts="ts", right_ts="rts", value_cols=["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_forward_matches_naive(spark):
    """Forward as-of == naive 'earliest right >= left' per key, ties
    match, no-successor rows NULL."""
    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 250), (3, "b", 50), (4, "c", 10)],
        "lid int, k string, ts long",
    )
    right = spark.createDataFrame(
        [("a", 100, 11), ("a", 200, 12), ("b", 40, 13), ("b", 60, 14)],
        "k string, ts long, rv int",
    )
    out = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts",
            value_cols=["rv"], direction="forward",
        ).collect()
    }
    # lid 1: tie at 100 matches rv=11; lid 2: nothing >= 250 -> NULL;
    # lid 3: earliest >= 50 is 60 -> 14; lid 4: key c absent -> NULL
    assert out == {1: 11, 2: None, 3: 14, 4: None}


def test_asof_values_come_from_one_row(spark):
    """A matched right row with NULLs must NOT resurrect older values:
    all carried columns come from the same (nearest) right row."""
    from job_etl_spark.operators.asof import asof_join

    right = spark.createDataFrame(
        [(1, 1, 5.0, None), (1, 2, None, 7.0)],
        "k int, ts int, a double, b double",
    )
    left = spark.createDataFrame([(1, 3)], "k int, ts int")
    out = asof_join(
        left, right.withColumnRenamed("ts", "rts"), "k", "ts", "rts", ["a", "b"]
    ).first()
    # nearest right row is (ts=2, a=NULL, b=7): a must be NULL, not 5
    assert out["a"] is None and out["b"] == 7.0


def test_asof_inner_keeps_null_valued_match(spark):
    """inner drops only unmatched left rows — a matched right row whose
    value columns are NULL still counts as a match."""
    from job_etl_spark.operators.asof import asof_join

    right = spark.createDataFrame([(1, 1, None)], "k int, rts int, price double")
    left = spark.createDataFrame([(1, 2), (2, 2)], "k int, ts int")
    rows = asof_join(left, right, "k", "ts", "rts", ["price"], how="inner").collect()
    assert len(rows) == 1 and rows[0]["k"] == 1 and rows[0]["price"] is None


def test_asof_rejects_colliding_value_cols(spark):
    from job_etl_spark.operators.asof import asof_join

    right = spark.createDataFrame([(1, 1, 2.0)], "k int, rts int, price double")
    left = spark.createDataFrame([(1, 2, 9.0)], "k int, ts int, price double")
    with pytest.raises(ValueError, match="price"):
        asof_join(left, right, "k", "ts", "rts", ["price"])
