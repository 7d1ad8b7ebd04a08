"""Trigger surface + source selection (reference parity: trigger menu
SparkUtils.scala:151-156, Kafka option builder SparkUtils.scala:95-108,
schema inference Phase2Job.scala:67-76)."""

import time

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.config import DatasetConfig
from dataingestion_spark.sources.datagen import gen_changes, write_change_files
from dataingestion_spark.streaming.monitor import graceful_stop
from dataingestion_spark.streaming.pipeline import (
    TRIGGERS,
    apply_changes,
    bootstrap_table,
    build_kafka_options,
    stage_changes,
)
from tests.util import TRANSCRIPT_SCHEMA


def test_kafka_option_builder():
    opts = build_kafka_options("broker1:9092,broker2:9092", "binlog.transcripts")
    # the reference's exact option set (SparkUtils.scala:95-108)
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "binlog.transcripts"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"
    assert opts["kafka.session.timeout.ms"] == "30000"
    assert opts["kafka.request.timeout.ms"] == "40000"
    assert "maxOffsetsPerTrigger" not in opts

    opts = build_kafka_options(
        "b:9092", "t", starting_offsets="latest", max_offsets_per_trigger=50_000
    )
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "50000"


def test_stage_kafka_requires_options(spark, tmp_path):
    with pytest.raises(ValueError, match="kafka_options"):
        stage_changes(
            spark, None, str(tmp_path / "s"), str(tmp_path / "c"),
            schema=None, source_format="kafka",
        )


def test_trigger_menu_names():
    assert TRIGGERS == {
        "fast": "30 seconds", "normal": "1 minute", "slow": "5 minutes"
    }


def test_processing_time_trigger_multi_batch_and_graceful_stop(spark, tmp_path):
    """A processing-time trigger must run multiple timed micro-batches
    (not drain-and-stop), apply them exactly-once, and shut down
    gracefully mid-stream."""
    landing = tmp_path / "landing"
    changes = gen_changes(spark, n_events=2_000, n_convs=30, n_files=4, seed=7)
    write_change_files(changes, landing)

    cfg = DatasetConfig(
        name="trig",
        table_path=str(tmp_path / "table"),
        pk_fields=["conv_id", "turn_idx"],
        order_fields=["lsn", "ts"],
        num_buckets=4,
    )
    tbl = bootstrap_table(spark, cfg, TRANSCRIPT_SCHEMA)
    q = apply_changes(
        spark, cfg, str(landing), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        available_now=False,
        trigger="1 second",
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            progress = q.recentProgress
            done = [p for p in progress if p["numInputRows"] > 0]
            if len(done) >= 2:
                break
            time.sleep(0.5)
        assert len(done) >= 2, "expected >=2 timed micro-batches"
    finally:
        graceful_stop(q, drain_seconds=30)
    # every file eventually applied exactly once (graceful_stop drains)
    applied = tbl.read().count()
    assert applied > 0
    state = tbl.read()
    assert state.count() == state.select("conv_id", "turn_idx").distinct().count()


def test_stage_json_source_with_schema_inference(spark, tmp_path):
    """JSON landing + schema=None: the stage infers the schema from landed
    files (Phase2Job.scala:67-76) and stages typed parquet."""
    landing = tmp_path / "landing"
    changes = gen_changes(spark, n_events=500, n_convs=10, n_files=2, seed=8)
    changes.write.mode("overwrite").json(str(landing))

    q = stage_changes(
        spark, str(landing), str(tmp_path / "staged"), str(tmp_path / "ckpt"),
        schema=None, source_format="json",
    )
    q.awaitTermination()
    staged = spark.read.parquet(str(tmp_path / "staged"))
    assert staged.count() == 500
    cols = set(staged.columns)
    assert {"op", "conv_id", "turn_idx", "lsn", "_meta"} <= cols
    # JSON inference widens ints to long - acceptable; the apply-side schema
    # gate reconciles against the table type
    assert dict(staged.dtypes)["lsn"] == "bigint"


def test_apply_schema_inference_from_staged_parquet(spark, tmp_path):
    """apply_changes(schema=None) infers the change schema from the staged
    parquet and still reaches oracle-equal final state."""
    from dataingestion_spark import oracle
    from tests.util import assert_table_equals_oracle

    landing = tmp_path / "landing"
    changes = gen_changes(spark, n_events=2_000, n_convs=25, n_files=2, seed=9)
    write_change_files(changes, landing)
    cfg = DatasetConfig(
        name="infer",
        table_path=str(tmp_path / "table"),
        pk_fields=["conv_id", "turn_idx"],
        order_fields=["lsn", "ts"],
        num_buckets=4,
    )
    bootstrap_table(spark, cfg, TRANSCRIPT_SCHEMA)
    q = apply_changes(spark, cfg, str(landing), str(tmp_path / "ckpt"))
    q.awaitTermination()
    tbl = bootstrap_table(spark, cfg, TRANSCRIPT_SCHEMA)
    expected = oracle.replay(changes.toPandas())
    assert_table_equals_oracle(tbl.read(), expected)


def test_stage_dedup_within_watermark(spark, tmp_path):
    """Exact re-deliveries of (conv_id, turn_idx, lsn) across micro-batches
    are dropped at staging when dedup_within_watermark is set; distinct
    events all survive."""
    from pyspark.sql import types as T
    from dataingestion_spark.cli import CHANGE_SCHEMA

    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        ("INSERT", "c1", 0, "user", "v1", None, "2024-01-01 00:00:00", 10, "f0"),
        ("INSERT", "c1", 1, "user", "v1", None, "2024-01-01 00:00:30", 12, "f0"),
    ]
    schema = (
        "op string, conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, lsn long, source_file string"
    )
    import shutil

    def land(name, rs):
        stage = tmp_path / f"_stage_{name}"
        df = spark.createDataFrame(rs, schema).withColumn(
            "ts", F.to_timestamp("ts")
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        shutil.move(str(part), landing / f"{name}.parquet")

    land("f0", rows)
    # second file: one exact redelivery + one new event, within watermark
    land(
        "f1",
        [
            ("INSERT", "c1", 0, "user", "v1", None, "2024-01-01 00:00:00", 10, "f1"),
            ("UPDATE", "c1", 0, "user", "v2", None, "2024-01-01 00:01:00", 14, "f1"),
        ],
    )

    q = stage_changes(
        spark, str(landing), str(tmp_path / "staged"), str(tmp_path / "ckpt"),
        schema=CHANGE_SCHEMA,
        max_files_per_trigger=1,
        dedup_within_watermark="10 minutes",
    )
    q.awaitTermination()
    staged = spark.read.parquet(str(tmp_path / "staged"))
    got = staged.select("conv_id", "turn_idx", "lsn").orderBy("lsn").collect()
    assert [(r.conv_id, r.turn_idx, r.lsn) for r in got] == [
        ("c1", 0, 10), ("c1", 1, 12), ("c1", 0, 14)
    ], "redelivery of lsn=10 must be dropped, distinct events kept"
