"""Custom stateful streaming operator (applyInPandasWithState): state
accumulates across micro-batches and the final per-conversation progress
matches a batch groupBy of the same input."""

import pandas as pd
from pyspark.sql import functions as F

from dataingestion_spark.sources.datagen import gen_changes, write_change_files
from dataingestion_spark.streaming.stateful import conversation_progress


def test_conversation_progress_matches_batch_aggregate(spark, tmp_path):
    changes = gen_changes(spark, n_events=3_000, n_convs=25, n_files=4, seed=11)
    changes.persist()
    write_change_files(changes, tmp_path / "landing")

    stream = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches -> state folds
        .parquet(str(tmp_path / "landing"))
    )
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    # last emitted row per conversation = final state
    got = (
        spark.table("conv_progress")
        .toPandas()
        .groupby("conv_id")
        .last()
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = (
        changes.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lsn").alias("max_lsn"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    changes.unpersist()
    cols = ["conv_id", "n_events", "max_lsn", "max_turn_idx", "last_ts"]
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)
