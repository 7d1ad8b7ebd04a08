"""Bucket-count evolution (LakeTable.rebucket), the table-health report
(describe) and the small-file compaction criterion - the operations that
let a table's layout GROW with it: buckets are the unit of merge
parallelism and rewrite granularity (SCALE.md sizing note: a 100 TB
table wants thousands of buckets, not the 8 it was created with), so the
count must be changeable after creation, Iceberg-spec-evolution style,
without breaking exactly-once pipelines, time travel or the LWW guard."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataingestion_spark.lake.table import BUCKET_COL, LakeTable, bucket_expr
from dataingestion_spark.oracle import replay
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA, assert_table_equals_oracle

CHANGE_DDL = (
    "op string, conv_id string, turn_idx int, role string, text string, "
    "tool string, ts long, lsn long, source_file string"
)


def _make_table(spark, path, num_buckets=4):
    return LakeTable.create(
        spark,
        path,
        TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"],
        order_fields=["lsn", "ts"],
        num_buckets=num_buckets,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_DDL).withColumn(
        "ts", F.timestamp_seconds("ts")
    )


def test_rebucket_preserves_state_and_serves_merges(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir, num_buckets=4)
    changes = gen_changes(spark, n_events=3000, n_convs=40, seed=11)
    changes = changes.persist()
    tbl.merge(changes, pipeline_id="p", epoch_id=0)
    oracle = replay(changes.toPandas())
    changes.unpersist()

    snap = tbl.rebucket(16)
    assert snap.operation == "rebucket" and snap.num_buckets == 16
    assert snap.summary == {"from_buckets": 4, "to_buckets": 16}
    assert not snap.deltas
    assert_table_equals_oracle(tbl.read(), oracle)

    # stored buckets match the NEW transform for every row
    raw = tbl.read(include_system=True)
    mism = raw.filter(
        F.col(BUCKET_COL)
        != bucket_expr("conv_id", 16, TRANSCRIPT_SCHEMA["conv_id"].dataType)
    ).count()
    assert mism == 0

    # epoch markers carried over: replaying epoch 0 is still skipped
    v = tbl.current_version()
    assert tbl.merge(_batch(spark, []), pipeline_id="p", epoch_id=0) is None
    assert tbl.current_version() == v

    # a subsequent merge under the new layout composes with LWW
    late = gen_changes(spark, n_events=500, n_convs=40, seed=11,
                       lsn_offset=1_000_000)
    late = late.persist()
    tbl.merge(late, pipeline_id="p", epoch_id=1)
    combined = pd.concat([replay_input(spark, 3000, 11), late.toPandas()])
    expected = replay(combined)
    late.unpersist()
    assert_table_equals_oracle(tbl.read(), expected)


def replay_input(spark, n_events, seed):
    return gen_changes(spark, n_events=n_events, n_convs=40, seed=seed).toPandas()


def test_rebucket_folds_mor_deltas_and_time_travels(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir, num_buckets=4)
    changes = gen_changes(spark, n_events=2000, n_convs=30, seed=13)
    changes = changes.persist()
    tbl.merge(changes, pipeline_id="p", epoch_id=0, write_mode="mor")
    assert any(tbl.snapshot().deltas.values())
    oracle = replay(changes.toPandas())
    changes.unpersist()
    v_pre = tbl.current_version()

    tbl.rebucket(8)
    assert_table_equals_oracle(tbl.read(), oracle)
    # time travel reads the OLD layout faithfully
    assert tbl.snapshot(v_pre).num_buckets == 4
    assert_table_equals_oracle(tbl.read(version=v_pre), oracle)


def test_rebucket_preserves_tombstone_guard(spark, tmp_table_dir):
    """Tombstones survive the rewrite with their lsn, so a stale arrival
    after a rebucket still cannot resurrect a deleted key."""
    tbl = _make_table(spark, tmp_table_dir, num_buckets=2)
    tbl.merge(
        _batch(
            spark,
            [
                ("INSERT", "c1", 0, "user", "a", None, 100, 10, "f"),
                ("DELETE", "c1", 0, None, None, None, 101, 20, "f"),
                ("INSERT", "c2", 0, "user", "b", None, 102, 21, "f"),
            ],
        ),
        pipeline_id="p",
        epoch_id=0,
    )
    tbl.rebucket(8)
    tbl.merge(
        _batch(spark, [("UPDATE", "c1", 0, "user", "stale", None, 99, 15, "f")]),
        pipeline_id="p",
        epoch_id=1,
    )
    got = tbl.read().toPandas()
    assert sorted(got["conv_id"]) == ["c2"]


def test_rebucket_same_count_is_noop_and_validates(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir, num_buckets=4)
    tbl.merge(
        _batch(spark, [("INSERT", "c1", 0, "user", "a", None, 100, 10, "f")]),
        pipeline_id="p", epoch_id=0,
    )
    v = tbl.current_version()
    assert tbl.rebucket(4).version == v
    with pytest.raises(ValueError, match=">= 1"):
        tbl.rebucket(0)


def test_rebase_refuses_splice_across_rebucket(spark, tmp_table_dir):
    """A commit computed under the old hash layout must recompute after an
    intervening rebucket - even when its buckets LOOK disjoint from the
    head's (the ids mean different key sets under the new transform)."""
    tbl = _make_table(spark, tmp_table_dir, num_buckets=4)
    other = LakeTable(spark, tmp_table_dir)
    tbl.merge(
        _batch(spark, [("INSERT", "c1", 0, "user", "a", None, 100, 10, "f")]),
        pipeline_id="p", epoch_id=0,
    )
    stale = tbl.snapshot()
    other.rebucket(16)

    orig = tbl.snapshot
    state = {"used": False}

    def snap_fn(version=None):
        if version is None and not state["used"]:
            state["used"] = True
            return stale
        return orig(version)

    tbl.snapshot = snap_fn
    try:
        tbl.merge(
            _batch(spark, [("INSERT", "c9", 0, "user", "z", None, 103, 30, "f")]),
            pipeline_id="p", epoch_id=1,
        )
    finally:
        tbl.snapshot = orig
    assert tbl.snapshot().num_buckets == 16
    got = tbl.read().toPandas()
    assert sorted(got["conv_id"]) == ["c1", "c9"]
    raw = tbl.read(include_system=True)
    assert (
        raw.filter(
            F.col(BUCKET_COL)
            != bucket_expr("conv_id", 16, TRANSCRIPT_SCHEMA["conv_id"].dataType)
        ).count()
        == 0
    ), "post-rebucket commit must bucket under the new transform"


def test_describe_and_small_file_compaction_policy(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir, num_buckets=2)
    for e in range(4):
        tbl.append(
            _batch(
                spark,
                [("INSERT", f"c{e}", 0, "user", "x", None, 100 + e, 10 + e, "f")],
            ).drop("op"),
            pipeline_id="a",
            epoch_id=e,
        )
    rep = tbl.describe()
    assert rep["num_buckets"] == 2
    assert rep["data_files"] >= 4
    assert rep["max_files_per_bucket"] >= 2
    assert rep["pipelines"] == {"a": 3}
    assert rep["snapshots_retained"] == len(tbl.history())
    sized = tbl.describe(with_sizes=True)
    assert sized["total_bytes"] > 0

    # small-file criterion: no delta chains, but base file lists are due
    assert tbl.maybe_compact(max_base_files_per_bucket=100) is None
    snap = tbl.maybe_compact(max_base_files_per_bucket=2)
    assert snap is not None and snap.operation == "compact"
    assert tbl.describe()["max_files_per_bucket"] <= 1 or (
        tbl.describe()["data_files"] < rep["data_files"]
    )
    assert tbl.read().count() == 4
