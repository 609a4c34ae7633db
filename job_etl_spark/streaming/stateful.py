"""Custom stateful streaming operators.

Two implementations of gap-based sessionization (the streaming twin of
batch q34, and the canonical "operator Spark's SQL surface can't express
declaratively... except it can" pair):

- ``session_stats_native`` — the built-in ``F.session_window`` path: pure
  Catalyst, mergeable partial aggregates, works identically over batch
  and streaming frames. This is the production default.
- ``sessionize_stateful`` — the same semantics hand-built on
  ``applyInPandasWithState``: per-key mutable state (open session), rows
  arriving in Arrow batches, event-time timeout flushing idle sessions
  once the watermark passes. This is the documented EXTENSION POINT for
  stateful logic that genuinely has no declarative form (e.g. CEP-style
  pattern state machines, online model state); sessionization is used
  here because its batch twin (q34) makes equivalence testable.

State model of ``sessionize_stateful``: one open session per user —
(start_us, last_us, n, total). An incoming event either extends the open
session (gap ≤ threshold) or closes it (emitted downstream) and opens a
new one. An event-time timeout at ``last_us + gap`` emits sessions for
users that went quiet. Assumes per-user event-time order across
micro-batches (guaranteed by the watermark + in-order sources; late rows
beyond the gap would start a new session, same as the reference's
watermark-margin reruns).

At 100 TB scale the state store shards by user_id across executors
(HDFS/RocksDB state backend); nothing here is driver-side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAP_US_DEFAULT = 30 * 60 * 1_000_000  # 30 min, same as batch q34

SESSION_OUT_SCHEMA = (
    "user_id long, start_us long, end_us long, n_events long, session_value double"
)
_STATE_SCHEMA = "start_us long, last_us long, n long, total double"


def session_stats_native(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based session aggregation via the native ``session_window`` —
    one shuffle, mergeable session state, batch/streaming-identical."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("start_us"),
            "n_events",
            "session_value",
        )
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lower: str = "interval 1 hour",
    upper: str = "interval 0 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join: match right rows with
    ``right_ts ∈ [left_ts − lower, left_ts + upper]`` on the same key.
    Both sides carry watermarks, so the join's buffered state is evicted
    once event time passes the interval + watermark — bounded state, the
    streaming twin of the batch ``banded_range_join`` (q44). ``left_ts``
    and ``right_ts`` must be distinct column names (rename before
    calling); matched pairs emit as soon as both rows have arrived."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & F.expr(f"{right_ts} >= {left_ts} - {lower}")
        & F.expr(f"{right_ts} <= {left_ts} + {upper}")
    )
    return l.join(r, cond, "inner").drop(r[key])


def _sessionize_fn(gap_us: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        out: list[tuple[int, int, int, int, float]] = []

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            out.append((user_id, start_us, last_us, n, total))
            state.remove()
        else:
            cur = list(state.get) if state.exists else None
            rows: list[tuple[int, float]] = []
            for pdf in pdfs:
                rows.extend(
                    zip(pdf["ts_us"].astype("int64"), pdf["value"].astype("float64"))
                )
            rows.sort()
            for ts_us, value in rows:
                if cur is not None and ts_us - cur[1] > gap_us:
                    out.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    cur = None
                if cur is None:
                    cur = [ts_us, ts_us, 1, value]
                else:
                    cur[1] = ts_us
                    cur[2] += 1
                    cur[3] += value
            if cur is not None:
                state.update(tuple(cur))
                # flush once the event-time watermark passes the gap
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)

        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "start_us", "end_us", "n_events", "session_value"],
            )

    return fn


def sessionize_stateful(
    events: DataFrame,
    gap_us: int = GAP_US_DEFAULT,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization on ``applyInPandasWithState``: emits one
    row per CLOSED session (closed by a later event past the gap, or by
    the event-time timeout when the user goes idle). ``ts_us`` is derived
    JVM-side with ``unix_micros`` so the pandas state function never
    touches timezone-dependent values."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("ts_us", F.unix_micros(ts_col))
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_us),
            SESSION_OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


_EWMA_OUT_SCHEMA = (
    "user_id LONG, n_events LONG, ewma DOUBLE"
)
_EWMA_STATE_SCHEMA = "s DOUBLE, last_t LONG, n LONG"


def _ewma_fn(alpha: float):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        s, last_t, n = state.get if state.exists else (0.0, -1, 0)
        rows: list[tuple[int, int, float]] = []
        for pdf in pdfs:
            rows.extend(
                zip(
                    pdf["ts_us"].astype("int64"),
                    pdf["event_id"].astype("int64"),
                    pdf["value"].astype("float64"),
                )
            )
        rows.sort()
        for _ts, _eid, x in rows:
            s = alpha * x + (1.0 - alpha) * s
            n += 1
        if rows:
            last_t = rows[-1][0]
            state.update((s, last_t, n))
            yield pd.DataFrame(
                [(user_id, n, s)], columns=["user_id", "n_events", "ewma"]
            )

    return fn


def ewma_stateful(
    events: DataFrame,
    alpha: float = 0.2,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Live per-entity EWMA (q136's zero-init recurrence as a stream):
    each trigger folds the group's new rows — ordered by (ts, event_id),
    the same total order as the batch operator — into (s, last_t, n)
    state and emits the group's updated running value. In-order delivery
    gives exact batch parity (asserted in tests); late rows fold at
    arrival (standard EWMA-monitor behavior — the smoothing absorbs
    them)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("ts_us", F.unix_micros(ts_col))
        .groupBy("user_id")
        .applyInPandasWithState(
            _ewma_fn(alpha),
            _EWMA_OUT_SCHEMA,
            _EWMA_STATE_SCHEMA,
            "append",  # each emission is a final per-trigger snapshot row
            GroupStateTimeout.NoTimeout,
        )
    )
