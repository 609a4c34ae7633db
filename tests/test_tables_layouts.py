"""Regression tests for the two physical layouts of events.ts
(``tables._events`` / ``tables.ts_strictly_after``).

The driver testdata has shipped ``ts`` both as parquet TIMESTAMP(NANOS)
and TIMESTAMP(MICROS); both must come out as a µs TimestampType with
pushdown-friendly watermark predicates, and an integer cutoff must mean
epoch-MICROS on both layouts (ADVICE r01: the native branch used to cast
a long as SECONDS).
"""

from __future__ import annotations

import calendar
import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from job_etl_spark.tables import table, ts_strictly_after

pytestmark = pytest.mark.smoke

_TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 100),
    dt.datetime(2024, 1, 1, 0, 0, 1, 0),
    dt.datetime(2024, 1, 1, 0, 0, 1, 999_999),
    dt.datetime(2024, 1, 2, 12, 30, 0, 500_000),
]


def _micros(d: dt.datetime) -> int:
    return calendar.timegm(d.utctimetuple()) * 1_000_000 + d.microsecond


def _write_events(path, unit: str) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(_TS)), pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([1] * len(_TS), pa.int64()),
            "event_type": pa.array(["click"] * len(_TS)),
            "value": pa.array([1.0] * len(_TS)),
            "props": pa.array(["{}"] * len(_TS)),
        }
    )
    pq.write_table(tbl, str(path), version="2.6")


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_layouts_read_and_watermark(spark, tmp_path, unit):
    d = tmp_path / unit
    d.mkdir()
    _write_events(d / "events.parquet", unit)
    ev = table(spark, str(d), name="events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in ev.select("ts").collect())
    assert got == sorted(_TS)

    # strict > semantics, datetime and integer-µs cutoffs agree on both layouts
    cut = _TS[1]  # exactly equal to one row — strictness matters
    n_dt = ev.where(ts_strictly_after(ev, cut)).count()
    n_us = ev.where(ts_strictly_after(ev, _micros(cut))).count()
    n_ref = ev.where(F.col("ts") > F.lit(cut)).count()
    assert n_dt == n_us == n_ref == 2


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_events_watermark_pushes_down(spark, tmp_path, unit):
    d = tmp_path / unit
    d.mkdir()
    _write_events(d / "events.parquet", unit)
    ev = table(spark, str(d), name="events")
    plan = (
        ev.where(ts_strictly_after(ev, _micros(_TS[1])))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "PushedFilters: []" not in pushed[0]


def test_events_loader_is_repeat_idempotent(spark):
    """The events loader mutates spark.sql.legacy.parquet.nanosAsLong when
    it meets the nanos layout; a second load in the SAME session — and a
    load of a NON-events table after it — must still be correct (the
    driver runs many queries through one session)."""
    from job_etl_spark.tables import table

    a = table(spark, "/root/testdata/sf0.001", "events")
    n1 = a.count()
    b = table(spark, "/root/testdata/sf0.001", "events")
    assert b.count() == n1
    assert [f.name for f in a.schema.fields] == [f.name for f in b.schema.fields]
    # interleave another table: conf leakage would break its timestamp read
    o = table(spark, "/root/testdata/sf0.001", "orders")
    assert o.count() > 0 and dict(o.dtypes)["o_orderdate"].startswith("timestamp")


def test_events_spark_written_directory_layout(spark, tmp_path):
    """A Spark-written events table (multi-file DIRECTORY, INT96
    timestamps — Spark's default parquet output) must load through
    ``tables.table``: INT96 surfaces as timestamp[ns] in pyarrow but is
    NOT the legacy int64-nanos layout, and the schema probe must accept
    a directory by probing a part file."""
    src = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    dst = tmp_path / "scaled"
    dst.mkdir()
    src.repartition(4).write.parquet(str(dst / "events.parquet"))

    out = table(spark, str(dst), "events")
    assert dict(out.dtypes)["ts"] == "timestamp"
    assert out.count() == src.count()
    # the instants survive the round trip
    a = sorted(r[0] for r in src.select(F.unix_micros("ts")).collect())
    b = sorted(r[0] for r in out.select(F.unix_micros("ts")).collect())
    assert a == b
    # and the watermark predicate still works on the re-written layout
    cut = a[len(a) // 2]
    n_after = out.where(ts_strictly_after(out, cut)).count()
    assert n_after == sum(1 for x in a if x > cut)


def test_table_memo_hit_and_staleness_miss(spark, tmp_path):
    """``table()`` memoizes the analyzed DataFrame per (session, path,
    freshness stamp): repeat calls return the same object (no ~80 ms
    re-analysis), and a rebuilt file (new mtime) re-resolves so a stale
    FileIndex is never served."""
    import shutil
    import os as _os

    import pyarrow.parquet as _pq

    p = tmp_path / "region.parquet"
    shutil.copy("/root/testdata/sf0.001/region.parquet", p)
    a = table(spark, str(tmp_path), "region")
    assert table(spark, str(tmp_path), "region") is a  # memo hit
    n0 = a.count()
    assert n0 == 5
    _pq.write_table(_pq.read_table(str(p)).slice(0, 2), str(p))
    _os.utime(p)  # make the mtime tick observable on coarse filesystems
    b = table(spark, str(tmp_path), "region")
    assert b is not a  # stamp changed -> fresh analysis
    assert b.count() == 2


def test_table_memo_directory_inplace_overwrite_misses(spark, tmp_path):
    """ADVICE r4: for a DIRECTORY table, overwriting a part file in place
    (same file name) changes neither the directory's mtime nor its size —
    the stamp must fold in per-entry (name, mtime, size) so the memo
    cannot serve a plan pointing at stale file lengths."""
    import os as _os

    import pyarrow.parquet as _pq

    src = _pq.read_table("/root/testdata/sf0.001/region.parquet")
    d = tmp_path / "region.parquet"
    d.mkdir()
    part = d / "part-00000.parquet"
    _pq.write_table(src, str(part))
    dir_stat_before = _os.stat(d)
    a = table(spark, str(tmp_path), "region")
    assert table(spark, str(tmp_path), "region") is a
    assert a.count() == 5
    # in-place rewrite: same entry name, different content/length
    _pq.write_table(src.slice(0, 3), str(part))
    # the trap precondition: the directory stat alone did NOT change size
    assert _os.stat(d).st_size == dir_stat_before.st_size
    b = table(spark, str(tmp_path), "region")
    assert b is not a  # per-entry stamp changed -> fresh analysis
    assert b.count() == 3


def test_table_memo_nested_subdir_never_caches(spark, tmp_path):
    """ADVICE r5: a NESTED layout (e.g. partitioned date=*/) hides in-place
    part overwrites from the flat per-entry stamp, so the memo must not
    cache such paths at all — every call re-analyzes, and a rewrite inside
    the subdirectory is always observed."""
    import pyarrow.parquet as _pq

    src = _pq.read_table("/root/testdata/sf0.001/region.parquet")
    d = tmp_path / "region.parquet"
    sub = d / "r_name=x"
    sub.mkdir(parents=True)
    part = sub / "part-00000.parquet"
    _pq.write_table(src.drop_columns([]) , str(part))
    a = table(spark, str(tmp_path), "region")
    assert table(spark, str(tmp_path), "region") is not a  # never memoized
    n0 = a.count()
    # in-place rewrite INSIDE the subdir: invisible to a flat stamp
    _pq.write_table(src.slice(0, 2), str(part))
    b = table(spark, str(tmp_path), "region")
    assert b.count() == 2 and n0 == 5


def test_table_memo_nested_subdir_does_not_grow_cache(spark, tmp_path):
    """ADVICE r6: uncacheable (nested-layout) paths must not INSERT into
    the per-session memo either — a never-reusable entry per call would
    grow the cache and pin analyzed DataFrames for the session's
    lifetime."""
    import pyarrow.parquet as _pq

    from job_etl_spark import tables as _t

    src = _pq.read_table("/root/testdata/sf0.001/region.parquet")
    d = tmp_path / "region.parquet"
    sub = d / "r_name=x"
    sub.mkdir(parents=True)
    _pq.write_table(src, str(sub / "part-00000.parquet"))
    per = _t._TABLE_CACHE.setdefault(spark, {})
    n0 = len(per)
    for _ in range(3):
        table(spark, str(tmp_path), "region")
    assert len(per) == n0  # no growth across repeated uncacheable loads


def test_stamp_oserror_is_uncacheable(tmp_path, monkeypatch):
    """ADVICE r6: an intermittent stat failure must map to the uncacheable
    sentinel, not a stable constant (None) that would serve stale plans
    forever once inserted under it."""
    import os as _os

    from job_etl_spark import tables as _t

    def _boom(path):
        raise OSError("transient stat failure")

    monkeypatch.setattr(_os, "stat", _boom)
    assert _t._stamp(str(tmp_path)) is _t._UNCACHEABLE


def test_propagate_zero_budget_raises_cleanly(spark):
    """ADVICE r5: max_iter <= 0 never runs the loop body; the for-else
    diagnostic must be a well-formed RuntimeError, not an UnboundLocalError
    on `changed`."""
    import pytest as _pytest

    from job_etl_spark.ml.cluster import connected_components

    edges = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    with _pytest.raises(RuntimeError, match="max_iter"):
        # collect_max_edges=0 forces the distributed _propagate path
        connected_components(edges, max_iter=0, collect_max_edges=0)
