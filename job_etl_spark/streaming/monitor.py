"""Streaming observability: per-batch progress capture.

Production streaming needs throughput/latency visibility (rows/sec,
batch duration, state size) — the ops counterpart of the reference's
run-stats dicts (`services/*/main.py` stats + XCom counts). A
``StreamingQueryListener`` receives every progress event JVM-side and
records a compact summary; ``summary()`` aggregates into the same
stats-dict shape the batch pipeline reports.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ProgressMonitor(StreamingQueryListener):
    """Collects one record per micro-batch: rows, rows/sec, duration.

    Attach with ``spark.streams.addListener(monitor)``; detach with
    ``spark.streams.removeListener(monitor)``. Listener callbacks fire on
    a background thread — keep them allocation-light (this one appends a
    small dict)."""

    def __init__(self) -> None:
        self.batches: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.batches.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
            }
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def summary(self) -> dict:
        rows = sum(b["num_input_rows"] for b in self.batches)
        durs = [b["duration_ms"] for b in self.batches if b["duration_ms"]]
        return {
            "n_batches": len(self.batches),
            "total_rows": rows,
            "max_batch_ms": max(durs) if durs else None,
            "queries_started": len(self.started),
            "queries_terminated": len(self.terminated),
        }
