"""Event-time windowed aggregation with watermarks.

The reference has no watermark/window operator anywhere (SURVEY.md §2.8 -
late data is handled solely by LWW ordering); this module supplies the
standard Structured Streaming late-data surface the brief calls for
("watermarks + windowed aggs for late data") as an engine capability for
stream analytics over the change log - e.g. ingest-rate dashboards per
conversation window, fed from the same staged changelog the apply
pipeline tails.

Scale: a tumbling-window count/max aggregate is map-side combinable and
its state is bounded by (#active windows x #groups); the watermark evicts
state for windows older than the allowed lateness, so state does not grow
with stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    group_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time windows with a watermark: rows later than
    ``watermark`` behind the max seen event time are dropped from state
    (completed windows emit finalized counts under append mode).

    Returns (window_start, window_end, <group_col>, n_events, max_lsn).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(group_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(group_col),
            "n_events",
            "max_lsn",
        )
    )


def session_event_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 minutes",
    group_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time SESSION windows (Spark's native ``session_window``):
    per group, a session extends while consecutive events arrive within
    ``gap``; the watermark finalizes and evicts sessions once event time
    passes their end + allowed lateness - the streaming counterpart of
    the batch ``operators/temporal.py sessionize`` (which numbers a key's
    complete history; this one emits sessions incrementally with bounded
    state).

    Returns (session_start, session_end, <group_col>, n_events)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(group_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(group_col),
            "n_events",
        )
    )
