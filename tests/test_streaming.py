"""Structured Streaming equivalence: the same transformations produce the
same results over a stream (availableNow micro-batches) as over the batch
frame, and foreachBatch merge matches J3 semantics under replay."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from job_etl_spark.pipeline.runner import TableStore
from job_etl_spark.streaming import (
    foreach_batch_merge,
    stream_from_directory,
    windowed_event_stats,
)
from job_etl_spark.tables import table
from tests.conftest import SF_SMOKE


def test_windowed_stats_stream_equals_batch(spark):
    events = table(spark, SF_SMOKE, "events")
    src = tempfile.mkdtemp(prefix="jobspark_stream_src_")
    events.write.mode("overwrite").parquet(src)
    schema = events.schema

    batch_result = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_stats(events).collect()
    }

    stream = stream_from_directory(spark, src, schema)
    assert stream.isStreaming
    out_rows = []

    def sink(df, _bid):
        out_rows.extend(df.collect())

    q = (
        windowed_event_stats(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream_result = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in out_rows
    }
    assert stream_result == batch_result and len(batch_result) > 0


def test_stream_normalize_converges_to_batch(spark):
    """Raw landing files streamed in two drops → staging equals the batch
    pipeline's staging (same identities, merge semantics under replay)."""
    import datetime as dt

    from job_etl_spark.sources.base import land_raw
    from job_etl_spark.sources.mock_adapter import MockAdapter
    from job_etl_spark.streaming import stream_normalize

    run_ts = dt.datetime(2026, 1, 1, 7, 0, 0)
    adapter = MockAdapter(num_jobs=60)
    jobs = adapter.fetch_all()
    raw_dir = tempfile.mkdtemp(prefix="jobspark_rawstream_")
    ckpt = tempfile.mkdtemp(prefix="jobspark_ckpt_")
    store = TableStore(spark, tempfile.mkdtemp(prefix="jobspark_swh_"))

    land_raw(spark, jobs[:30], run_ts).write.mode("append").parquet(raw_dir)
    q = stream_normalize(store, adapter, raw_dir, run_ts, ckpt)
    q.awaitTermination(300)
    first = store.read("staging_job_postings").count()

    land_raw(spark, jobs[30:], run_ts).write.mode("append").parquet(raw_dir)
    q2 = stream_normalize(store, adapter, raw_dir, run_ts, ckpt)
    q2.awaitTermination(300)
    staging = store.read("staging_job_postings")
    # 60 mock jobs → 30 distinct identities; merge keeps them unique
    assert first <= 30 and staging.count() == 30
    assert staging.select("hash_key").distinct().count() == 30


def test_foreach_batch_merge_idempotent(spark):
    store = TableStore(spark, tempfile.mkdtemp(prefix="jobspark_stream_wh_"))
    rows = spark.createDataFrame(
        [("k1", "a", 1), ("k2", "b", 2)], "hash_key string, v string, seen int"
    )
    merge = foreach_batch_merge(
        store, "t", keys=["hash_key"], overwrite_cols=["seen"], coalesce_cols=["v"]
    )
    merge(rows, 0)
    merge(rows, 1)  # replayed micro-batch must be a no-op
    out = store.read("t")
    assert out.count() == 2
    upd = spark.createDataFrame([("k1", None, 9)], "hash_key string, v string, seen int")
    merge(upd, 2)
    r = store.read("t").where(F.col("hash_key") == "k1").first()
    assert r["seen"] == 9 and r["v"] == "a"  # overwrite bumped, coalesce kept


def test_stream_normalize_continuous_trigger(spark):
    """processingTime trigger: the query stays live and picks up files
    landed AFTER start — the continuous-ingest deployment mode."""
    import datetime as dt
    import time

    from job_etl_spark.sources.base import land_raw
    from job_etl_spark.sources.mock_adapter import MockAdapter
    from job_etl_spark.streaming import stream_normalize

    run_ts = dt.datetime(2026, 1, 1, 7, 0, 0)
    # the mock's identity pool cycles with period 30 → N jobs yield
    # min(N, 30) distinct identities
    adapter = MockAdapter(num_jobs=60)
    jobs = adapter.fetch_all()
    raw_dir = tempfile.mkdtemp(prefix="jobspark_rawcont_")
    ckpt = tempfile.mkdtemp(prefix="jobspark_ckptcont_")
    store = TableStore(spark, tempfile.mkdtemp(prefix="jobspark_swhcont_"))

    land_raw(spark, jobs[:20], run_ts).write.mode("append").parquet(raw_dir)
    q = stream_normalize(
        store, adapter, raw_dir, run_ts, ckpt, processing_time="1 second"
    )
    try:
        assert q.isActive

        def staging_count():
            # polling a COW table the stream concurrently rewrites: a read
            # that lists a file the next batch's rewrite already replaced
            # fails task-side with FileNotFoundException — that is the
            # poll's own race, not a product defect (single-writer tables
            # make no concurrent-reader promise); treat it as "not ready"
            # and let the loop retry, like the table-absent case below
            try:
                return store.read("staging_job_postings").count()
            except FileNotFoundError:
                return 0
            except Exception as e:  # Py4JJavaError: mid-rewrite read race
                if "FileNotFoundException" in str(e):
                    return -1
                raise

        deadline = time.time() + 120

        def wait_for(target):
            n = staging_count()
            while n < target and time.time() < deadline:
                time.sleep(1)
                n = staging_count()
            return n

        assert wait_for(20) == 20  # first drop drained: 20 identities
        # second drop lands while the query is live: jobs 20-59 add
        # exactly identities 20-29 (the rest are cycle duplicates)
        land_raw(spark, jobs[20:], run_ts).write.mode("append").parquet(raw_dir)
        assert wait_for(30) == 30
        assert q.isActive  # still running — it did not drain-and-stop
    finally:
        q.stop()


def test_session_window_native_stream_equals_batch(spark):
    """Native session_window: streaming availableNow result == batch
    result over the same events."""
    from job_etl_spark.streaming import session_stats_native

    events = table(spark, SF_SMOKE, "events")
    src = tempfile.mkdtemp(prefix="jobspark_sess_src_")
    events.write.mode("overwrite").parquet(src)

    batch = {
        (r["user_id"], r["start_us"]): (r["n_events"], round(r["session_value"], 6))
        for r in session_stats_native(events).collect()
    }
    out_rows = []
    q = (
        session_stats_native(stream_from_directory(spark, src, events.schema))
        .writeStream.outputMode("complete")
        .foreachBatch(lambda df, _b: out_rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r["user_id"], r["start_us"]): (r["n_events"], round(r["session_value"], 6))
        for r in out_rows
    }
    assert streamed == batch and len(batch) > 0


def test_sessionize_stateful_applyinpandas(spark):
    """applyInPandasWithState sessionization: two micro-batch drops; the
    second drop's events close the first drop's sessions across the batch
    boundary (state carried in the state store), and a final far-future
    flush event closes everything else. Emitted sessions must equal the
    batch gap-sessionization of the real events."""
    import datetime as dt

    from pyspark.sql import Window

    from job_etl_spark.streaming import sessionize_stateful

    def ev(uid, minute, value):
        return (uid, dt.datetime(2026, 1, 1, 10 + minute // 60, minute % 60), value)

    # user 1: two sessions (gap at 40 min); user 2: one session
    drop1 = [ev(1, 0, 1.0), ev(1, 10, 2.0), ev(2, 5, 5.0)]
    drop2 = [ev(1, 50, 3.0), ev(1, 55, 4.0), ev(2, 20, 6.0)]
    flush = [(uid, dt.datetime(2026, 6, 1), 0.0) for uid in (1, 2)]
    schema = "user_id long, ts timestamp, value double"

    src = tempfile.mkdtemp(prefix="jobspark_stateful_src_")
    ckpt = tempfile.mkdtemp(prefix="jobspark_stateful_ckpt_")
    out_rows = []

    def run_drop(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        q = (
            sessionize_stateful(stream_from_directory(spark, src, schema))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _b: out_rows.extend(df.collect()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_drop(drop1)
    run_drop(drop2)
    run_drop(flush)

    got = {
        (r["user_id"], r["start_us"]): (r["end_us"], r["n_events"], r["session_value"])
        for r in out_rows
        if r["start_us"] < int(dt.datetime(2026, 6, 1).timestamp()) * 1_000_000
    }

    # batch twin (q34 logic) over the real events
    batch_ev = spark.createDataFrame(drop1 + drop2, schema)
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag(F.unix_micros("ts")).over(w)
    sess = batch_ev.withColumn(
        "new_sess",
        F.when(prev.isNull() | (F.unix_micros("ts") - prev > 30 * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    expect = {
        (r["user_id"], r["start_us"]): (r["end_us"], r["n"], r["total"])
        for r in sess.groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_micros("ts")).alias("start_us"),
            F.max(F.unix_micros("ts")).alias("end_us"),
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        )
        .collect()
    }
    assert got == expect and len(expect) == 3


def test_interval_join_stream_equals_batch(spark):
    """Stream-stream interval join (watermark-bounded state) produces the
    same pairs as the batch banded_range_join over the same data."""
    import datetime as dt

    from job_etl_spark.operators.range_join import banded_range_join
    from job_etl_spark.streaming import interval_join_stream

    def t(minute):
        return dt.datetime(2026, 1, 1, 10 + minute // 60, minute % 60)

    purchases = [(100 + i, 1 + i % 2, t(m)) for i, m in enumerate([30, 45, 90])]
    clicks = [(200 + i, 1 + i % 2, t(m)) for i, m in enumerate([0, 20, 40, 85])]
    p_schema = "purchase_id long, user_id long, p_ts timestamp"
    c_schema = "click_id long, user_id long, c_ts timestamp"
    p_dir = tempfile.mkdtemp(prefix="jobspark_ssj_p_")
    c_dir = tempfile.mkdtemp(prefix="jobspark_ssj_c_")
    spark.createDataFrame(purchases, p_schema).write.mode("append").parquet(p_dir)
    spark.createDataFrame(clicks, c_schema).write.mode("append").parquet(c_dir)

    joined = interval_join_stream(
        stream_from_directory(spark, p_dir, p_schema),
        stream_from_directory(spark, c_dir, c_schema),
        key="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        lower="interval 1 hour",
        upper="interval 0 seconds",
    )
    assert joined.isStreaming
    out = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _b: out.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted((r["purchase_id"], r["click_id"]) for r in out)

    hour_us = 3_600_000_000
    batch = banded_range_join(
        spark.createDataFrame(purchases, p_schema).withColumn(
            "ts_us", F.unix_micros("p_ts")
        ),
        spark.createDataFrame(clicks, c_schema).withColumn(
            "c_ts_us", F.unix_micros("c_ts")
        ),
        keys=["user_id"],
        left_val="ts_us",
        right_val="c_ts_us",
        lower=-hour_us,
        upper=0,
    )
    expect = sorted((r["purchase_id"], r["click_id"]) for r in batch.collect())
    assert got == expect and len(expect) > 0


def test_drop_duplicates_within_watermark(spark):
    """Streaming hash-key dedup (dropDuplicatesWithinWatermark): a
    duplicate identity arriving in a LATER micro-batch within the
    watermark is dropped — the streaming twin of J3's keep-first merge."""
    import datetime as dt

    def t(minute):
        return dt.datetime(2026, 1, 1, 10, minute)

    schema = "hash_key string, seen_at timestamp, payload string"
    drop1 = [("k1", t(0), "a"), ("k2", t(1), "b")]
    drop2 = [("k1", t(5), "a-dup"), ("k3", t(6), "c")]

    src = tempfile.mkdtemp(prefix="jobspark_dedup_src_")
    ckpt = tempfile.mkdtemp(prefix="jobspark_dedup_ckpt_")
    out_rows = []

    def run_drop(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        q = (
            stream_from_directory(spark, src, schema)
            .withWatermark("seen_at", "1 hour")
            .dropDuplicatesWithinWatermark(["hash_key"])
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _b: out_rows.extend(df.collect()))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_drop(drop1)
    run_drop(drop2)
    got = sorted((r["hash_key"], r["payload"]) for r in out_rows)
    assert got == [("k1", "a"), ("k2", "b"), ("k3", "c")]


def test_progress_monitor_listener(spark):
    """StreamingQueryListener captures per-batch throughput: total rows
    observed across batches equals the data streamed."""
    import time

    from job_etl_spark.streaming.monitor import ProgressMonitor

    events = table(spark, SF_SMOKE, "events").limit(500)
    src = tempfile.mkdtemp(prefix="jobspark_mon_src_")
    events.write.mode("overwrite").parquet(src)

    mon = ProgressMonitor()
    spark.streams.addListener(mon)
    try:
        q = (
            stream_from_directory(spark, src, events.schema)
            .groupBy("event_type")
            .count()
            .writeStream.outputMode("complete")
            .format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while mon.summary()["total_rows"] < 500 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(mon)
    s = mon.summary()
    assert s["total_rows"] == 500 and s["n_batches"] >= 1
    assert s["queries_started"] >= 1


def test_stream_mor_upsert_matches_batch_merge(spark, tmp_path):
    """foreachBatch → merge-on-read deltas: the merged view after the
    stream equals a batch latest-wins merge of the same files, and the
    write path lands one delta per non-initial micro-batch."""
    import os

    from job_etl_spark.pipeline.runner import TableStore
    from job_etl_spark.streaming.pipeline import foreach_batch_mor

    src = tmp_path / "src"
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "k int, v string, seen int"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))

    store = TableStore(spark, str(tmp_path / "tables"))
    schema = "k int, v string, seen int"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_mor(store, "t", ["k"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got1 = sorted((r["k"], r["v"], r["seen"]) for r in store.mor_read("t").collect())
    assert got1 == [(1, "a", 10), (2, "b", 10)]

    # second file updates k=2 and inserts k=3; restart the stream
    spark.createDataFrame(
        [(2, "B", 20), (3, "c", 20)], "k int, v string, seen int"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
    q = (
        stream.writeStream.foreachBatch(foreach_batch_mor(store, "t", ["k"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got2 = sorted((r["k"], r["v"], r["seen"]) for r in store.mor_read("t").collect())
    assert got2 == [(1, "a", 10), (2, "B", 20), (3, "c", 20)]
    assert store.mor_deltas("t") == [1]
    # compaction preserves the merged view
    store.mor_compact("t")
    got3 = sorted((r["k"], r["v"], r["seen"]) for r in store.mor_read("t").collect())
    assert got3 == got2 and store.mor_deltas("t") == []


def test_stream_mor_policy_fold_matches_batch_merge(spark, tmp_path):
    """Streaming J3: foreach_batch_mor with a merge POLICY — each
    micro-batch is a COALESCE-merge statement, and the read-time fold
    must equal applying merge_upsert batch-by-batch (keep-first keeps
    the first batch's value, coalesce takes newest non-null, overwrite
    takes the newest batch outright)."""
    import os

    from job_etl_spark.operators.merge import merge_upsert
    from job_etl_spark.pipeline.runner import TableStore
    from job_etl_spark.streaming.pipeline import foreach_batch_mor

    POL = {"overwrite": ["ow"], "coalesce": ["co"], "keep_first": ["kf"]}
    schema = "k int, ow string, co string, kf string"
    src = tmp_path / "src"
    os.makedirs(src)
    batches = [
        [(1, "ow1", None, "kf1"), (2, "ow1", "co1", None)],
        [(1, "ow2", "co2", "kf2"), (3, "ow2", None, "kf2")],
        [(2, None, None, "kf3")],
    ]
    store = TableStore(spark, str(tmp_path / "tables"))
    for i, rows in enumerate(batches, start=1):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"f{i}"))
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(
                foreach_batch_mor(store, "t", ["k"], policy=POL)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch-by-batch COW replica over the same files
    cow = spark.createDataFrame(batches[0], schema)
    for rows in batches[1:]:
        cow = merge_upsert(
            cow, spark.createDataFrame(rows, schema), ["k"],
            overwrite_cols=POL["overwrite"], coalesce_cols=POL["coalesce"],
            keep_first_cols=POL["keep_first"],
        )
    want = sorted(tuple(r) for r in cow.collect())
    got = sorted(tuple(r) for r in store.mor_read("t").collect())
    assert got == want
    # spot-pin the class semantics
    by_k = {r[0]: r for r in got}
    assert by_k[1] == (1, "ow2", "co2", "kf1")  # overwrite newest, kf first
    assert by_k[2] == (2, None, "co1", "kf3")   # overwrite takes newest NULL
    # compaction folds through the same policy
    store.mor_compact("t")
    assert sorted(tuple(r) for r in store.mor_read("t").collect()) == want


def test_stream_cms_equals_batch_sketch(spark, tmp_path):
    """foreachBatch CMS merging: after streaming N files one per trigger,
    the persisted sketch equals a single batch build over all rows."""
    import os

    from job_etl_spark.operators.cms import build_cms
    from job_etl_spark.pipeline.runner import TableStore
    from job_etl_spark.streaming.pipeline import foreach_batch_cms

    src = tmp_path / "src"
    os.makedirs(src)
    rows1 = [(f"u{i % 7}",) for i in range(40)]
    rows2 = [(f"u{i % 11}",) for i in range(60)]
    spark.createDataFrame(rows1, "uid string").coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(rows2, "uid string").coalesce(1).write.parquet(str(src / "f2"))

    store = TableStore(spark, str(tmp_path / "tables"))
    stream = (
        spark.readStream.schema("uid string").option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_cms(store, "sk", "uid"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {(r["depth"], r["cell"]): r["n"] for r in store.read("sk").collect()}
    full = build_cms(
        spark.createDataFrame(rows1 + rows2, "uid string"), "uid"
    )
    want = {(r["depth"], r["cell"]): r["n"] for r in full.collect()}
    assert streamed == want


def test_stream_kmv_equals_batch_sketch(spark, tmp_path):
    """foreachBatch KMV merging: after N per-file triggers the persisted
    sketch equals a single batch build, hence identical estimates."""
    import os

    from job_etl_spark.operators.sketch import kmv_sketch
    from job_etl_spark.pipeline.runner import TableStore
    from job_etl_spark.streaming.pipeline import foreach_batch_kmv

    src = tmp_path / "src"
    os.makedirs(src)
    rows1 = [("a", f"u{i}") for i in range(30)]
    rows2 = [("a", f"u{i + 15}") for i in range(30)] + [("b", f"v{i}") for i in range(5)]
    spark.createDataFrame(rows1, "g string, uid string").coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(rows2, "g string, uid string").coalesce(1).write.parquet(
        str(src / "f2")
    )
    store = TableStore(spark, str(tmp_path / "tables"))
    stream = (
        spark.readStream.schema("g string, uid string")
        .option("maxFilesPerTrigger", 1).parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_kmv(store, "sk", "uid", "g", k=16))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted((r["g"], r["h"]) for r in store.read("sk").collect())
    full = kmv_sketch(
        spark.createDataFrame(rows1 + rows2, "g string, uid string"), "uid", ["g"], k=16
    )
    assert streamed == sorted((r["g"], r["h"]) for r in full.collect())


def test_stream_lsh_neardup_ingestion(spark, tmp_path):
    """foreachBatch LSH near-dup ingestion: exact/near duplicate texts
    arriving in later triggers (or later in the same trigger) are
    rejected against the persisted band state; distinct docs are
    admitted and extend the state. First occurrence wins."""
    import os

    from job_etl_spark.pipeline.runner import TableStore
    from job_etl_spark.streaming.pipeline import foreach_batch_lsh_neardup

    base = (
        "the quick brown fox jumps over the lazy dog and keeps on running "
        "far beyond the river through the quiet woods until the morning"
    )
    other = (
        "completely different content about distributed query engines "
        "partitioning shuffles and broadcast joins at petabyte scale today"
    )
    third = (
        "a third unrelated document mentioning neither animals nor engines "
        "but orchards rainfall harvest seasons and long winter evenings"
    )
    near = base.replace("morning", "evening")  # near-dup of base
    batch1 = [(1, base), (2, other), (3, base)]  # 3 exact-dups 1 in-batch
    batch2 = [(4, near), (5, third)]  # 4 near-dups stored state; 5 new

    src = tmp_path / "src"
    os.makedirs(src)
    spark.createDataFrame(batch1, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(batch2, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "f2")
    )

    store = TableStore(spark, str(tmp_path / "tables"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_lsh_neardup(store))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    accepted = sorted(r["doc_id"] for r in store.read("accepted_docs").collect())
    assert accepted == [1, 2, 5]
    # band state covers exactly the accepted docs
    band_ids = {r["doc_id"] for r in store.read("lsh_bands").collect()}
    assert band_ids == {1, 2, 5}

    # replaying batch 2 must be a no-op (append-once)
    ingest = foreach_batch_lsh_neardup(store)
    ingest(spark.createDataFrame(batch2, "doc_id long, text string"), 99)
    accepted2 = sorted(r["doc_id"] for r in store.read("accepted_docs").collect())
    assert accepted2 == [1, 2, 5]


def test_stream_lsh_neardup_compaction_preserves_state(spark, tmp_path):
    """compact_every=N rewrites the state tables (temp+swap) every N
    batches: the file count stops growing per-trigger while accepted/
    band CONTENT stays identical to the pure-append run — compaction
    changes only the physical layout."""
    import glob

    from job_etl_spark.pipeline.runner import TableStore
    from job_etl_spark.streaming.pipeline import foreach_batch_lsh_neardup

    def batches():
        # 6 batches of 3 distinct docs each (long unique texts)
        for b in range(1, 7):
            yield b, [
                (
                    b * 10 + i,
                    " ".join(f"w{b}x{i}t{j} common{j % 3}" for j in range(30)),
                )
                for i in range(3)
            ]

    stores = {}
    for label, every in (("plain", None), ("compacted", 2)):
        store = TableStore(spark, str(tmp_path / label))
        ingest = foreach_batch_lsh_neardup(store, compact_every=every)
        for b, rows in batches():
            ingest(spark.createDataFrame(rows, "doc_id long, text string"), b)
        stores[label] = store

    got = {
        label: (
            sorted(r["doc_id"] for r in s.read("accepted_docs").collect()),
            sorted(
                (r["doc_id"], r["band"], r["bucket"])
                for r in s.read("lsh_bands").collect()
            ),
        )
        for label, s in stores.items()
    }
    assert got["plain"] == got["compacted"]

    def nfiles(store, t):
        return len(glob.glob(store.path(t) + "/*.parquet"))

    par = spark.sparkContext.defaultParallelism
    # last compaction ran at batch 6 (the final batch): bands file count is
    # bounded by the repartition width, not by one-file-per-trigger growth
    assert nfiles(stores["compacted"], "lsh_bands") <= par
    assert nfiles(stores["plain"], "lsh_bands") >= 6


def test_stream_quantile_equals_batch_sketch(spark, tmp_path):
    """foreachBatch histogram-sketch merging: after N per-file triggers
    the persisted sketch equals a single batch build — identical
    quantile read-offs."""
    import os

    from job_etl_spark.operators.sketch import histogram_sketch, sketch_quantiles
    from job_etl_spark.pipeline.runner import TableStore
    from job_etl_spark.streaming.pipeline import foreach_batch_quantile

    src = tmp_path / "src"
    os.makedirs(src)
    rows1 = [("a", float(i % 50)) for i in range(60)]
    rows2 = [("a", float(i % 90)) for i in range(40)] + [("b", 5.0)]
    spark.createDataFrame(rows1, "g string, v double").coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(rows2, "g string, v double").coalesce(1).write.parquet(
        str(src / "f2")
    )

    store = TableStore(spark, str(tmp_path / "tables"))
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_quantile(store, "sk", "v", ["g"], 0.0, 100.0, nbins=32)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full = histogram_sketch(
        spark.createDataFrame(rows1 + rows2, "g string, v double"),
        "v", ["g"], 0.0, 100.0, 32,
    )
    got = {(r["g"], r["bin"]): r["cnt"] for r in store.read("sk").collect()}
    want = {(r["g"], r["bin"]): r["cnt"] for r in full.collect()}
    assert got == want

    qs = {"p50": 0.5, "p90": 0.9}
    a = sketch_quantiles(store.read("sk"), ["g"], qs, 0.0, 100.0, 32).collect()
    b = sketch_quantiles(full, ["g"], qs, 0.0, 100.0, 32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ewma_stateful_matches_batch_segmented(spark, tmp_path):
    """Streaming per-user EWMA (applyInPandasWithState) after draining an
    in-order file stream equals q136's batch zero-init fold."""
    import os

    from job_etl_spark.queries.observability import q136_ewma_segmented
    from job_etl_spark.streaming.stateful import ewma_stateful
    from job_etl_spark.tables import table as load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    # two time-ordered files → two in-order triggers
    import pyspark.sql.functions as F

    cut = ev.agg(F.expr("percentile(unix_micros(ts), 0.5)")).first()[0]
    src = tmp_path / "src"
    os.makedirs(src)
    ev.where(F.unix_micros("ts") <= cut).coalesce(1).write.parquet(str(src / "f1"))
    ev.where(F.unix_micros("ts") > cut).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out_dir = tmp_path / "out"
    q = (
        ewma_stateful(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_rows = spark.read.parquet(str(out_dir)).collect()
    # keep each user's LAST emission (max n_events)
    got = {}
    for r in got_rows:
        if r["user_id"] not in got or r["n_events"] > got[r["user_id"]][0]:
            got[r["user_id"]] = (r["n_events"], r["ewma"])
    want = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in q136_ewma_segmented(spark, sf).collect()
    }
    assert set(got) == set(want)
    for uid, (n, e) in want.items():
        gn, ge = got[uid]
        assert gn == n, (uid, gn, n)
        assert abs(ge - e) < 5e-7, (uid, ge, e)
