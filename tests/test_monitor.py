"""Streaming progress monitoring (SURVEY.md §2.8 T4 / §2.1 S10): the
StreamingQueryListener metrics file gets START / PROGRESS / TERMINATED
records with per-batch row counts and throughput fields."""

import json
import time

from dataingestion_spark.sources.datagen import gen_changes, write_change_files
from dataingestion_spark.streaming.monitor import attach_metrics, graceful_stop
from dataingestion_spark.streaming.pipeline import stage_changes


def _read_records(path, want_rows, timeout_s=120.0):
    # generous timeout: listener delivery shares the driver with whatever
    # else the box is running - under full-suite load 30s has flaked
    """Listener delivery is asynchronous - poll until the progress rows
    sum to the expected count (or time out and return what arrived)."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if path.exists():
            records = [json.loads(l) for l in path.read_text().splitlines()]
            got = sum(
                r["num_input_rows"] for r in records if r["kind"] == "PROGRESS"
            )
            if got >= want_rows:
                return records
        time.sleep(0.5)
    return [json.loads(l) for l in path.read_text().splitlines()]


def test_progress_listener_records_batches(spark, tmp_path):
    changes = gen_changes(spark, n_events=2_000, n_convs=20, n_files=3, seed=7)
    write_change_files(changes, tmp_path / "landing")
    metrics_path = tmp_path / "metrics.jsonl"
    listener = attach_metrics(spark, metrics_path)
    try:
        q = stage_changes(
            spark,
            str(tmp_path / "landing"),
            str(tmp_path / "staged"),
            str(tmp_path / "ckpt"),
            changes.schema,
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        graceful_stop(q, drain_seconds=5)
        # read BEFORE detaching: events still queued on the listener bus
        # deliver only while the listener is attached
        records = _read_records(metrics_path, want_rows=2_000)
    finally:
        spark.streams.removeListener(listener)
    kinds = {r["kind"] for r in records}
    assert "START" in kinds and "PROGRESS" in kinds
    progress = [r for r in records if r["kind"] == "PROGRESS"]
    assert sum(r["num_input_rows"] for r in progress) == 2_000
    # per-batch duration + throughput fields present (metrics-service parity)
    assert all("durationMs" not in r for r in progress)  # flattened name
    assert all(isinstance(r["duration_ms"], dict) for r in progress)
