"""Merge-on-read delta resolution parity (J3 at 100 TB scale).

Pins the two claims the MOR staging path rests on:

1. ``merge_upsert_onto`` (broadcast-shaped decomposition: left join +
   key-semi + anti) is result-identical to ``merge_upsert`` (full-outer
   join) for every per-column class, nulls and null keys included.
2. The COALESCE-merge is associative: folding a stack of delta batches
   with ``fold_upsert_batches`` and merging ONCE equals applying
   ``merge_upsert`` batch-by-batch — so the MOR read (one window over
   delta rows + one base merge) is bit-identical to the COW write chain.

Reference semantics: services/normalizer/db_operations.py:427-460
(INSERT … ON CONFLICT DO UPDATE with keep-first/overwrite/COALESCE
column classes).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from job_etl_spark.operators.merge import (
    fold_upsert_batches,
    merge_upsert,
    merge_upsert_onto,
)

SCHEMA = "k string, ow string, co string, kf string, other string"
CLASSES = dict(
    keys=["k"], overwrite_cols=["ow"], coalesce_cols=["co"], keep_first_cols=["kf"]
)


def _rows(rng, keys, tag):
    """One batch: a random subset of keys, random nulls in every class."""
    out = []
    for k in keys:
        if rng.random() < 0.45:
            continue
        out.append(
            (
                k,
                None if rng.random() < 0.3 else f"ow-{tag}-{k}",
                None if rng.random() < 0.5 else f"co-{tag}-{k}",
                None if rng.random() < 0.5 else f"kf-{tag}-{k}",
                None if rng.random() < 0.5 else f"ot-{tag}-{k}",
            )
        )
    return out


def _collect(df):
    rows = [tuple(r) for r in df.select("k", "ow", "co", "kf", "other").collect()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def test_merge_upsert_onto_matches_full_outer(spark):
    rng = random.Random(90)
    keys = [f"k{i}" for i in range(40)]
    base = spark.createDataFrame(_rows(rng, keys, "b") + [(None, "ow-null", None, None, None)], SCHEMA)
    ups = spark.createDataFrame(_rows(rng, keys, "u") + [(None, None, "co-null", None, None)], SCHEMA)
    ref = merge_upsert(base, ups, **CLASSES)
    onto = merge_upsert_onto(base, ups, **CLASSES)
    assert _collect(ref) == _collect(onto)


def test_fold_equals_sequential_cow_merges(spark):
    """fold(u1..u4) then one merge == merge(merge(merge(merge(base,u1),u2),u3),u4)."""
    rng = random.Random(91)
    keys = [f"k{i}" for i in range(30)]
    base = spark.createDataFrame(_rows(rng, keys, "b"), SCHEMA)
    batches = [spark.createDataFrame(_rows(rng, keys, f"u{s}"), SCHEMA) for s in range(1, 5)]

    cow = base
    for b in batches:
        cow = merge_upsert(cow, b, **CLASSES)

    stack = None
    for s, b in enumerate(batches, start=1):
        d = b.withColumn("_seq", F.lit(s))
        stack = d if stack is None else stack.unionByName(d)
    folded, dead = fold_upsert_batches(stack, ["k"], ["ow"], ["co"])
    assert dead.count() == 0
    mor = merge_upsert_onto(base, folded, **CLASSES)
    assert _collect(cow) == _collect(mor)


def test_fold_tombstones(spark):
    """A key whose latest delta is a tombstone dies; a later upsert
    revives it with history BEFORE the tombstone discarded (fresh
    keep-first, fresh coalesce chain)."""
    base = spark.createDataFrame(
        [("a", "ow-b", "co-b", "kf-b", None), ("z", "ow-b", None, None, None)], SCHEMA
    )
    d1 = spark.createDataFrame(
        [("a", "ow-1", None, "kf-1", None, False), ("b", "ow-1", "co-1", "kf-1", None, False)],
        SCHEMA + ", _deleted boolean",
    ).withColumn("_seq", F.lit(1))
    d2 = spark.createDataFrame(
        [("a", None, None, None, None, True), ("b", None, None, None, None, True)],
        SCHEMA + ", _deleted boolean",
    ).withColumn("_seq", F.lit(2))
    d3 = spark.createDataFrame(
        [("b", "ow-3", None, None, "ot-3", False)], SCHEMA + ", _deleted boolean"
    ).withColumn("_seq", F.lit(3))
    stack = d1.unionByName(d2).unionByName(d3)
    folded, dead = fold_upsert_batches(stack, ["k"], ["ow"], ["co"])
    assert [r["k"] for r in dead.collect()] == ["a"]
    survivors = base.join(dead, ["k"], "left_anti")
    out = {r["k"]: r for r in merge_upsert_onto(survivors, folded, **CLASSES).collect()}
    assert set(out) == {"b", "z"}  # a deleted, z untouched, b revived
    # b's pre-tombstone history (d1) must NOT leak into the revived row
    assert out["b"]["ow"] == "ow-3" and out["b"]["co"] is None
    assert out["b"]["kf"] is None and out["b"]["other"] == "ot-3"
    assert out["z"]["ow"] == "ow-b"


def test_policy_mor_read_never_shuffles_base(spark, tmp_path):
    """The physical plan of a policy-table mor_read must keep the base out
    of every exchange: the delta fold windows over delta rows only, and
    the base merge is broadcast-shaped (merge_upsert_onto) — BroadcastHash
    joins, no SortMergeJoin. This IS the 100 TB read-path claim: read cost
    is base-scan + delta-sized work, never an O(table) shuffle."""
    from job_etl_spark.pipeline.runner import TableStore

    store = TableStore(spark, str(tmp_path))
    base = spark.range(0, 1000).selectExpr(
        "cast(id as string) k", "'ow-b' ow", "'co-b' co", "'kf-b' kf", "cast(null as string) other"
    )
    store.write("t", base)
    store.mor_init(
        "t", store.read("t"), ["k"],
        policy={"overwrite": ["ow"], "coalesce": ["co"], "keep_first": ["kf"]},
    )
    upd = spark.range(0, 20).selectExpr(
        "cast(id as string) k", "'ow-1' ow", "cast(null as string) co", "'kf-1' kf", "'ot-1' other"
    )
    store.mor_upsert("t", upd)
    store.mor_upsert("t", upd.withColumn("ow", F.lit("ow-2")))
    merged = store.mor_read("t")
    assert merged.count() == 1000
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_mor_table_refuses_forking_writes(spark, tmp_path):
    """A direct parquet write beside a MOR layout would be invisible to
    readers (read() prefers the merged view): plain overwrite must route
    through the MOR base replacement, and append / partition-overwrite
    must refuse loudly instead of silently forking."""
    import pytest

    from job_etl_spark.pipeline.runner import TableStore

    store = TableStore(spark, str(tmp_path))
    df = spark.range(5).selectExpr("cast(id as string) k", "'v' v")
    store.write("t", df)
    store.mor_init("t", store.read("t"), ["k"])
    store.mor_upsert("t", spark.range(5, 8).selectExpr("cast(id as string) k", "'d' v"))

    # overwrite routes through the MOR layout: deltas folded away, view = df2
    df2 = spark.range(100, 103).selectExpr("cast(id as string) k", "'w' v")
    store.write("t", df2)
    assert store.mor_exists("t") and store.mor_deltas("t") == []
    assert {r["k"] for r in store.read("t").collect()} == {"100", "101", "102"}

    with pytest.raises(ValueError, match="merge-on-read"):
        store.write("t", df2, mode="append")
    with pytest.raises(ValueError, match="merge-on-read"):
        store.write("t", df2, partition_by=["v"])
    with pytest.raises(ValueError, match="merge-on-read"):
        store.overwrite_partitions("t", df2, partition_by=["v"])


def test_fold_overwrite_null_wins(spark):
    """overwrite class: the latest batch's value lands outright — an
    explicit null in a newer batch beats an older non-null (last-writer
    semantics, same as the COW chain)."""
    base = spark.createDataFrame([("a", "ow-b", "co-b", "kf-b", None)], SCHEMA)
    d1 = spark.createDataFrame([("a", "ow-1", "co-1", None, None)], SCHEMA).withColumn(
        "_seq", F.lit(1)
    )
    d2 = spark.createDataFrame([("a", None, None, "kf-2", None)], SCHEMA).withColumn(
        "_seq", F.lit(2)
    )
    cow = merge_upsert(merge_upsert(base, d1.drop("_seq"), **CLASSES), d2.drop("_seq"), **CLASSES)
    folded, _ = fold_upsert_batches(d1.unionByName(d2), ["k"], ["ow"], ["co"])
    mor = merge_upsert_onto(base, folded, **CLASSES)
    assert _collect(cow) == _collect(mor)
    row = mor.first()
    assert row["ow"] is None  # d2's null overwrote
    assert row["co"] == "co-1" and row["kf"] == "kf-b"
