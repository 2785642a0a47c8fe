"""Rows/sec + progress metrics.

The reference aggregates per-task counters tree-wise into a job report
(SURVEY.md §2.5, [UP core/.../statistics/communication/
CommunicationTool.java]). Here, authoritative per-batch metrics are
computed in the engine's stats pass and lineage rides inside the table
commit; this module adds the operational surfaces around them:

  * MetricsLog — append-only JSONL of per-batch engine metrics
    (rows, wall_sec, rows_per_sec), for dashboards/scrapers.
  * attach_listener — a StreamingQueryListener mirroring Spark's own
    progress events (inputRowsPerSecond, batchDuration) into the same
    log, giving the framework's independent view next to the engine's.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLog:
    """Line-per-record JSONL sink; no-op when path is None."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def emit(self, record: dict) -> None:
        if not self.path:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps({"ts": time.time(), **record}) + "\n")

    def read(self) -> list[dict]:
        if not self.path or not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def attach_listener(spark, log: MetricsLog):
    """Mirror StreamingQueryProgress into the metrics log. Returns the
    listener (pass to spark.streams.removeListener to detach)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            log.emit({"event": "started", "query_id": str(event.id)})

        def onQueryProgress(self, event):
            p = event.progress
            log.emit({
                "event": "progress",
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
            })

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            log.emit({"event": "terminated", "query_id": str(event.id)})

    listener = _L()
    spark.streams.addListener(listener)
    return listener
