"""Streaming progress monitoring + graceful shutdown.

Reference parity:
  * progress loop + logged progress fields (inputRowsPerSecond,
    processedRowsPerSecond, batchId, durationMs) -
    /root/reference/spark/src/main/scala/com/example/core/SparkUtils.scala:50-86
    and LoggingUtils.scala:82-95;
  * metrics push per batch (records_processed, duration_ms, throughput_rps,
    status) - /root/reference/metrics-service/src/main/java/com/example/
    metrics/service/MetricsService.java:81-131;
  * graceful shutdown hook - SparkUtils.scala:50-66.

Implemented the idiomatic PySpark way: a ``StreamingQueryListener``
appending one JSON line per micro-batch progress event to a local metrics
file (the sandbox stand-in for the metrics service's POST endpoint), plus
a ``graceful_stop`` helper that drains in-flight work before ``stop()``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.listener import StreamingQueryListener


class ProgressMetricsListener(StreamingQueryListener):
    """Append one JSON metrics line per micro-batch progress event.

    Fields mirror the reference's IngestionMetric entity
    (/root/reference/metrics-service/src/main/java/com/example/metrics/
    entity/IngestionMetric.java:22-75): batch id, rows, duration,
    throughput, status.
    """

    def __init__(self, metrics_path: str | Path):
        self.path = Path(metrics_path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def _write(self, record: dict) -> None:
        with self.path.open("a") as f:
            f.write(json.dumps(record) + "\n")

    def onQueryStarted(self, event) -> None:
        self._write(
            {
                "kind": "START",
                "query_id": str(event.id),
                "run_id": str(event.runId),
                "name": event.name,
                "ts": time.time(),
            }
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "kind": "PROGRESS",
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs) if p.durationMs else {},
                "ts": time.time(),
            }
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "kind": "TERMINATED",
                "query_id": str(event.id),
                "exception": event.exception,
                "status": "FAILED" if event.exception else "SUCCESS",
                "ts": time.time(),
            }
        )


def attach_metrics(spark: SparkSession, metrics_path: str | Path) -> ProgressMetricsListener:
    """Register a ProgressMetricsListener on the session; returns it so the
    caller can detach with ``spark.streams.removeListener``."""
    listener = ProgressMetricsListener(metrics_path)
    spark.streams.addListener(listener)
    return listener


def graceful_stop(query: StreamingQuery, drain_seconds: float = 30.0) -> None:
    """Stop a streaming query after letting in-flight triggers drain:
    wait until the query reports no new data (or the deadline), then stop.
    The reference's shutdown hook semantics (SparkUtils.scala:50-66)."""
    deadline = time.time() + drain_seconds
    while time.time() < deadline:
        status = query.status
        if not status["isDataAvailable"] and not status["isTriggerActive"]:
            break
        time.sleep(0.5)
    query.stop()
    query.awaitTermination()
