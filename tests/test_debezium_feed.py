"""Outbound Debezium change feed (LakeTable.read_changes_envelope): the
emit-side complement of sources.cdc_formats.parse_debezium. The reference
only CONSUMES change streams (kafka/binlog adapters,
core/src/main/scala/com/example/core/SparkUtils.scala:95-108); a lake
that other pipelines chain off also needs to PRODUCE one, in the public
Debezium envelope so any standard consumer subscribes without bespoke
glue. The load-bearing invariant: parse(emit(diff)) recovers the
canonical change relation, and applying that relation to a copy of the
``from`` state reproduces the ``to`` state exactly."""

import json

import pandas as pd
from pyspark.sql import functions as F

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.cdc_formats import parse_debezium
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA, assert_table_equals_oracle

PAYLOAD_FIELDS = [
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp"),
]
KEY_FIELDS = [("conv_id", "string"), ("turn_idx", "int")]


def _make_table(spark, path, num_buckets=4):
    return LakeTable.create(
        spark,
        path,
        TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"],
        order_fields=["lsn", "ts"],
        num_buckets=num_buckets,
    )


def _two_epoch_table(spark, path, n_events=3000, seed=7):
    tbl = _make_table(spark, path)
    ch = gen_changes(
        spark, n_events=n_events, n_convs=40, max_turns=30, seed=seed,
        hash_mode="md5",
    )
    cut = (n_events * 2) * 2 // 3
    v0 = None
    for epoch, cond in enumerate(
        [F.col("lsn") < cut, F.col("lsn") >= cut]
    ):
        tbl.merge(ch.filter(cond), pipeline_id="feed", epoch_id=epoch)
        if epoch == 0:
            v0 = tbl.current_version()
    return tbl, v0


def test_envelope_shape_and_op_mapping(spark, tmp_table_dir):
    tbl, v0 = _two_epoch_table(spark, tmp_table_dir)
    env = tbl.read_changes_envelope(v0, db="lakedb").toPandas()
    cl = tbl.read_changes(v0).toPandas()
    assert len(env) == len(cl)
    by_op = {"c": 0, "u": 0, "d": 0}
    head_version = tbl.current_version()
    for _, row in env.iterrows():
        key = json.loads(row["key"])
        val = json.loads(row["value"])
        assert set(key) == {"conv_id", "turn_idx"}
        # explicit-null envelope: every top-level field always present
        assert set(val) == {"before", "after", "source", "op", "ts_ms"}
        by_op[val["op"]] += 1
        if val["op"] == "c":
            assert val["before"] is None and val["after"] is not None
        elif val["op"] == "d":
            assert val["after"] is None and val["before"] is not None
        else:
            assert val["before"] is not None and val["after"] is not None
        image = val["after"] or val["before"]
        assert image["conv_id"] == key["conv_id"]
        assert image["turn_idx"] == key["turn_idx"]
        assert val["source"] == {
            "db": "lakedb",
            "table": "table",
            "lsn": head_version,
        }
        img_ts = image["ts"]
        assert (val["ts_ms"] is None) == (img_ts is None)
    want = cl["change_type"].map(
        {"insert": "c", "update": "u", "delete": "d"}
    ).value_counts()
    assert by_op == {op: int(want.get(op, 0)) for op in ("c", "u", "d")}


def test_parse_emit_roundtrip_matches_changelog(spark, tmp_table_dir):
    tbl, v0 = _two_epoch_table(spark, tmp_table_dir)
    env = tbl.read_changes_envelope(v0)
    parsed = parse_debezium(
        env, payload_fields=PAYLOAD_FIELDS, key_fields=KEY_FIELDS
    ).toPandas()
    want = tbl.read_changes(v0).toPandas()
    want["op"] = want["change_type"].map(
        {"insert": "INSERT", "update": "UPDATE", "delete": "DELETE"}
    )
    # parse_debezium null-fills payload on deletes (payload comes from
    # ``after`` only); align the changelog's delete pre-images to that
    for c in ("role", "text", "tool", "ts"):
        want.loc[want["op"] == "DELETE", c] = None
    cols = ["op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = parsed[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = want[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # the feed's replay ordinal is the head snapshot version
    assert (parsed["lsn"] == tbl.current_version()).all() if len(parsed) else True


def test_feed_applies_downstream_to_head_state(spark, tmp_table_dir, tmp_path):
    """Subscribe a SECOND LakeTable to the feed via the standard Debezium
    adapter and require it to converge to the source head state - the
    end-to-end contract a downstream team actually relies on."""
    tbl, v0 = _two_epoch_table(spark, tmp_table_dir)
    dst = _make_table(spark, str(tmp_path / "dst"))
    # seed the subscriber with the source state as of v0 (snapshot load),
    # then apply the v0->head feed (incremental subscription)
    seed = tbl.read(version=v0).withColumn("op", F.lit("INSERT")).withColumn(
        "lsn", F.lit(0).cast("long")
    )
    dst.merge(seed, pipeline_id="sub", epoch_id=0)
    parsed = parse_debezium(
        tbl.read_changes_envelope(v0),
        payload_fields=PAYLOAD_FIELDS,
        key_fields=KEY_FIELDS,
    )
    dst.merge(parsed, pipeline_id="sub", epoch_id=1)
    want = (
        tbl.read()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert_table_equals_oracle(dst.read(), want)


def test_empty_range_emits_nothing(spark, tmp_table_dir):
    tbl, _ = _two_epoch_table(spark, tmp_table_dir, n_events=500)
    head = tbl.current_version()
    env = tbl.read_changes_envelope(head, head)
    assert env.columns == ["key", "value"]
    assert env.count() == 0


def test_table_without_ts_column_emits_null_ts_ms(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), schema, pk_fields=["k"],
        order_fields=["lsn"], num_buckets=2,
    )
    v0 = tbl.current_version()
    batch = spark.createDataFrame(
        [("INSERT", "a", 1, 1), ("INSERT", "b", 2, 2)],
        "op string, k string, v int, lsn long",
    )
    tbl.merge(batch, pipeline_id="t", epoch_id=0)
    env = tbl.read_changes_envelope(v0).toPandas()
    assert len(env) == 2
    for val in env["value"]:
        assert json.loads(val)["ts_ms"] is None


# ---------------------------------------------------------------------------
# emit_feed: incremental cursor-tracked emission (the Kafka-producer stand-in)
# ---------------------------------------------------------------------------


def _consume_feed(spark, feed_dir):
    import glob

    dirs = sorted(
        glob.glob(str(feed_dir) + "/v*-*"),
        key=lambda d: int(d.rsplit("/", 1)[1][1:].split("-")[0]),
    )
    return [
        (
            d,
            parse_debezium(
                spark.read.schema("key string, value string").json(d),
                payload_fields=PAYLOAD_FIELDS,
                key_fields=KEY_FIELDS,
            ),
        )
        for d in dirs
    ]


def test_emit_feed_full_cycle_and_idempotency(spark, tmp_table_dir, tmp_path):
    from dataingestion_spark.lake.sync import emit_feed

    feed = str(tmp_path / "feed")
    tbl, v0 = _two_epoch_table(spark, tmp_table_dir)
    # first emission: full state as inserts (Debezium initial snapshot)
    r1 = emit_feed(tbl, feed, db="lakedb", table_name="transcripts")
    assert r1["applied"] and r1["from_version"] == 1
    assert r1["to_version"] == tbl.current_version()
    assert r1["events"] == tbl.read().count()
    # cursor at head: nothing to do
    r2 = emit_feed(tbl, feed)
    assert not r2["applied"] and r2["events"] == 0
    # more changes -> incremental range only
    ch = gen_changes(
        spark, n_events=400, n_convs=40, max_turns=30, seed=99,
        hash_mode="md5",
    )
    tbl.merge(ch, pipeline_id="feed", epoch_id=7)
    r3 = emit_feed(tbl, feed)
    assert r3["applied"] and r3["from_version"] == r1["to_version"]
    assert r3["events"] < r1["events"] + 400  # net diff, not a re-dump
    # a subscriber replaying the ranges in order converges to source state
    dst = _make_table(spark, str(tmp_path / "dst"))
    for d, parsed in _consume_feed(spark, feed):
        to_v = int(d.rsplit("-", 1)[1])
        dst.merge(parsed, pipeline_id="sub", epoch_id=to_v)
    want = (
        tbl.read().toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert_table_equals_oracle(dst.read(), want)


def test_emit_feed_crash_replay_is_byte_stable(spark, tmp_table_dir, tmp_path):
    import json as j
    import os

    from dataingestion_spark.lake.sync import emit_feed

    feed = str(tmp_path / "feed")
    tbl, _ = _two_epoch_table(spark, tmp_table_dir, n_events=600)
    r1 = emit_feed(tbl, feed)
    first = set(
        r["value"]
        for r in spark.read.schema("key string, value string")
        .json(r1["path"]).collect()
    )
    # crash between file write and cursor advance == cursor rolled back:
    # the replay hits the SAME range directory with the SAME content
    with open(os.path.join(feed, "_feed_cursor.json"), "w") as fh:
        j.dump({"last_version": 1}, fh)
    r2 = emit_feed(tbl, feed)
    assert (r2["from_version"], r2["to_version"]) == (
        r1["from_version"], r1["to_version"],
    )
    assert r2["path"] == r1["path"]
    again = set(
        r["value"]
        for r in spark.read.schema("key string, value string")
        .json(r2["path"]).collect()
    )
    assert again == first


def test_emit_feed_expired_cursor_raises(spark, tmp_table_dir, tmp_path):
    import json as j
    import os

    import pytest

    from dataingestion_spark.lake.sync import emit_feed

    feed = str(tmp_path / "feed")
    tbl, _ = _two_epoch_table(spark, tmp_table_dir, n_events=300)
    emit_feed(tbl, feed)
    for e in range(8):
        tbl.merge(
            gen_changes(
                spark, n_events=50, n_convs=10, max_turns=10, seed=e,
                hash_mode="md5",
            ),
            pipeline_id="feed", epoch_id=10 + e,
        )
    os.makedirs(feed, exist_ok=True)
    with open(os.path.join(feed, "_feed_cursor.json"), "w") as fh:
        j.dump({"last_version": 2}, fh)
    tbl.expire_snapshots(keep_last=3)
    with pytest.raises(ValueError, match="expired"):
        emit_feed(tbl, feed)


def test_streaming_subscriber_chains_lake_to_lake(spark, tmp_table_dir, tmp_path):
    """subscribe_feed: Structured Streaming consumption of the emitted
    feed - the full produce -> Kafka-shaped wire -> streaming consume ->
    exactly-once merge chain, including catch-up over ranges published
    AFTER the first run and checkpoint-replay idempotency."""
    from dataingestion_spark.config import DatasetConfig
    from dataingestion_spark.lake.sync import emit_feed
    from dataingestion_spark.streaming.pipeline import subscribe_feed

    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    tbl, _ = _two_epoch_table(spark, tmp_table_dir)
    emit_feed(tbl, feed)
    cfg = DatasetConfig(
        name="sub",
        table_path=str(tmp_path / "dst"),
        pk_fields=["conv_id", "turn_idx"],
        order_fields=["lsn", "ts"],
        num_buckets=4,
        mode="upsert",
    )
    dst = _make_table(spark, cfg.table_path)

    def run_stream():
        q = subscribe_feed(
            spark, cfg, feed, ckpt,
            payload_fields=PAYLOAD_FIELDS, key_fields=KEY_FIELDS,
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_stream()
    # transport metadata (ts_ms/source_file) must NOT schema-evolve the
    # destination: the chained table's schema equals the source's
    assert [f.name for f in dst.snapshot().schema.fields] == [
        f.name for f in tbl.snapshot().schema.fields
    ]
    want = (
        tbl.read().toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert_table_equals_oracle(dst.read(), want)
    v_after_first = dst.current_version()
    # replay with the SAME checkpoint and no new ranges: nothing applied
    run_stream()
    assert dst.current_version() == v_after_first
    # publish more changes -> a new range dir appears -> catch-up run
    ch = gen_changes(
        spark, n_events=300, n_convs=30, max_turns=20, seed=5,
        hash_mode="md5",
    )
    tbl.merge(ch, pipeline_id="feed", epoch_id=9)
    r = emit_feed(tbl, feed)
    assert r["applied"]
    run_stream()
    want = (
        tbl.read().toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert_table_equals_oracle(dst.read(), want)
