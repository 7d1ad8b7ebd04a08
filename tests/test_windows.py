"""Watermarked tumbling-window aggregation: streaming result (append
mode, availableNow replay) matches the equivalent batch window aggregate,
and the plan carries the watermark/state eviction."""

import pandas as pd
from pyspark.sql import functions as F

from dataingestion_spark.sources.datagen import gen_changes, write_change_files
from dataingestion_spark.streaming.windows import windowed_event_counts


def test_windowed_counts_match_batch(spark, tmp_path):
    # arrival files ordered by lsn (and hence event time) - a watermarked
    # stream assumes bounded lateness, so the fully-random-order hash
    # chunking of the bench generator would (correctly) drop rows as late
    changes = gen_changes(spark, n_events=2_000, n_convs=20, n_files=1, seed=13)
    changes = changes.withColumn(
        "source_file",
        F.format_string("chunk_%05d", (F.col("lsn") / 1400).cast("int")),
    )
    changes.persist()
    write_change_files(changes, tmp_path / "landing")

    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "landing"))
    )
    q = (
        windowed_event_counts(stream, "1 minute", "2 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = spark.table("win_counts").toPandas()
    # append mode only emits windows the watermark has closed; every
    # emitted window must exactly match the batch aggregate
    want = (
        changes.groupBy(F.window("ts", "1 minute").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("lsn").alias("max_lsn"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role", "n_events", "max_lsn",
        )
        .toPandas()
    )
    changes.unpersist()
    assert not got.empty
    key = ["window_start", "role"]
    merged = got.merge(want, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got), "streamed window missing from batch result"
    pd.testing.assert_series_equal(
        merged["n_events_s"], merged["n_events_b"],
        check_names=False, check_dtype=False,
    )
    pd.testing.assert_series_equal(
        merged["max_lsn_s"], merged["max_lsn_b"],
        check_names=False, check_dtype=False,
    )


def test_session_windows_match_batch(spark, tmp_path):
    """Streaming session_window (native Spark session windows, the
    incremental counterpart of operators/temporal.sessionize) finalizes
    exactly the sessions the batch aggregate computes."""
    from dataingestion_spark.streaming.windows import session_event_counts

    changes = gen_changes(spark, n_events=2_000, n_convs=20, n_files=1, seed=17)
    changes = changes.withColumn(
        "source_file",
        F.format_string("chunk_%05d", (F.col("lsn") / 1400).cast("int")),
    )
    changes.persist()
    write_change_files(changes, tmp_path / "landing_s")

    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "landing_s"))
    )
    q = (
        session_event_counts(stream, gap="30 seconds", watermark="2 minutes")
        .writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = spark.table("sess_counts").toPandas()
    want = (
        changes.groupBy(
            F.session_window("ts", "30 seconds").alias("w"), "conv_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "conv_id", "n_events",
        )
        .toPandas()
    )
    changes.unpersist()
    assert not got.empty
    key = ["session_start", "conv_id"]
    merged = got.merge(want, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(got), "streamed session missing from batch result"
    pd.testing.assert_series_equal(
        merged["n_events_s"], merged["n_events_b"],
        check_names=False, check_dtype=False,
    )
