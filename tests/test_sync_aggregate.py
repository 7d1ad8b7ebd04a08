"""Incremental aggregate maintenance (lake/sync.py sync_aggregate):
a grouped COUNT/SUM view of a CDC-fed table kept current by applying
changelog deltas, never by rescanning the source - incremental view
maintenance in the medallion pattern. The invariant everywhere: after
every sync the view equals a fresh groupBy over the source's live state
(that recompute IS the test oracle), across inserts, LWW updates that
move rows between groups, deletes that empty a group, multi-epoch
catch-up, and crash-replay idempotency."""

import pandas as pd
from pyspark.sql import functions as F

from dataingestion_spark.lake.sync import sync_aggregate
from dataingestion_spark.lake.table import LakeTable
from tests.util import TRANSCRIPT_SCHEMA

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


def _assert_view_matches_recompute(src, view, group_col="role"):
    got = (
        view.read()
        .toPandas()
        .sort_values(group_col)
        .reset_index(drop=True)
    )
    want = (
        src.read()
        .filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("turn_idx").cast("long").alias("sum_turn_idx"),
        )
        .toPandas()
        .sort_values(group_col)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_aggregate_view_tracks_source_through_epochs(spark, tmp_path):
    src = _make_table(spark, str(tmp_path / "src"))
    view_path = str(tmp_path / "view")

    # epoch 0: inserts across two groups
    src.merge(
        _batch(
            spark,
            [
                ("INSERT", "c1", 0, "user", "a", None, 100, 10, "f"),
                ("INSERT", "c1", 1, "assistant", "b", None, 101, 11, "f"),
                ("INSERT", "c2", 0, "user", "c", None, 102, 12, "f"),
            ],
        ),
        pipeline_id="p", epoch_id=0,
    )
    snap = sync_aggregate(src, view_path, ["role"], sums=["turn_idx"])
    assert snap is not None
    view = LakeTable(spark, view_path)
    _assert_view_matches_recompute(src, view)

    # up-to-date: another sync is a no-op
    assert sync_aggregate(src, view_path, ["role"], sums=["turn_idx"]) is None

    # epoch 1: an update MOVES a row between groups (role change), a
    # delete empties nothing yet
    src.merge(
        _batch(
            spark,
            [
                ("UPDATE", "c1", 1, "tool", "b2", "t1", 103, 20, "f"),
                ("DELETE", "c2", 0, None, None, None, 104, 21, "f"),
            ],
        ),
        pipeline_id="p", epoch_id=1,
    )
    sync_aggregate(src, view_path, ["role"], sums=["turn_idx"])
    _assert_view_matches_recompute(src, view)
    got = view.read().toPandas().set_index("role")
    assert "assistant" not in got.index  # group emptied -> deleted from view
    assert got.loc["tool", "n_rows"] == 1

    # epochs 2+3 then ONE catch-up sync spanning both source versions
    src.merge(
        _batch(spark, [("INSERT", "c3", 0, "user", "d", None, 105, 30, "f")]),
        pipeline_id="p", epoch_id=2,
    )
    src.merge(
        _batch(spark, [("UPDATE", "c3", 0, "user", "d2", None, 106, 31, "f")]),
        pipeline_id="p", epoch_id=3,
    )
    sync_aggregate(src, view_path, ["role"], sums=["turn_idx"])
    _assert_view_matches_recompute(src, view)


def test_aggregate_view_replay_is_idempotent(spark, tmp_path):
    src = _make_table(spark, str(tmp_path / "src"))
    view_path = str(tmp_path / "view")
    src.merge(
        _batch(spark, [("INSERT", "c1", 0, "user", "a", None, 100, 10, "f")]),
        pipeline_id="p", epoch_id=0,
    )
    sync_aggregate(src, view_path, ["role"], sums=["turn_idx"])
    view = LakeTable(spark, view_path)
    v = view.current_version()
    # crash-replay: simulate a re-run against an unchanged source by
    # resetting nothing - the cursor already equals the source version
    assert sync_aggregate(src, view_path, ["role"], sums=["turn_idx"]) is None
    assert view.current_version() == v


def test_aggregate_view_cursor_moves_on_no_net_change(spark, tmp_path):
    """A source version bump with no row-level diff (compaction) still
    advances the cursor so later syncs read a short range."""
    src = _make_table(spark, str(tmp_path / "src"))
    view_path = str(tmp_path / "view")
    src.merge(
        _batch(spark, [("INSERT", "c1", 0, "user", "a", None, 100, 10, "f")]),
        pipeline_id="p", epoch_id=0,
    )
    sync_aggregate(src, view_path, ["role"])
    src.compact()
    snap = sync_aggregate(src, view_path, ["role"])
    view = LakeTable(spark, view_path)
    assert view.last_applied_epoch("aggsync") == src.current_version()
    _assert_view_matches_recompute_counts_only(src, view)


def _assert_view_matches_recompute_counts_only(src, view):
    got = view.read().toPandas().sort_values("role").reset_index(drop=True)
    want = (
        src.read()
        .filter(F.col("role").isNotNull())
        .groupBy("role")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .toPandas()
        .sort_values("role")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_aggregate_view_null_group_keys_excluded(spark, tmp_path):
    src = _make_table(spark, str(tmp_path / "src"))
    view_path = str(tmp_path / "view")
    src.merge(
        _batch(
            spark,
            [
                ("INSERT", "c1", 0, "user", "a", None, 100, 10, "f"),
                ("INSERT", "c1", 1, None, "b", None, 101, 11, "f"),  # null role
            ],
        ),
        pipeline_id="p", epoch_id=0,
    )
    sync_aggregate(src, view_path, ["role"])
    got = LakeTable(spark, view_path).read().toPandas()
    assert list(got["role"]) == ["user"] and int(got["n_rows"].iloc[0]) == 1


def test_aggregate_view_rejects_mismatched_destination(spark, tmp_path):
    import pytest

    src = _make_table(spark, str(tmp_path / "src"))
    view_path = str(tmp_path / "view")
    src.merge(
        _batch(spark, [("INSERT", "c1", 0, "user", "a", None, 100, 10, "f")]),
        pipeline_id="p", epoch_id=0,
    )
    sync_aggregate(src, view_path, ["role"], sums=["turn_idx"])
    with pytest.raises(ValueError, match="not the aggregate view"):
        sync_aggregate(src, view_path, ["conv_id"], sums=["turn_idx"])
    with pytest.raises(ValueError, match="not the aggregate view"):
        sync_aggregate(src, view_path, ["role"])  # sums spec differs


def test_streaming_pipeline_maintains_agg_view(spark, tmp_path):
    """agg_views in the dataset config: the view updates after every
    applied micro-batch and survives a checkpoint replay untouched - a
    streaming materialized view."""
    from dataingestion_spark.config import DatasetConfig
    from dataingestion_spark.sources.datagen import gen_changes, write_change_files
    from dataingestion_spark.streaming.pipeline import apply_changes, bootstrap_table
    from tests.util import TRANSCRIPT_SCHEMA

    d = {k: str(tmp_path / k) for k in ("landing", "ckpt", "table", "view")}
    changes = gen_changes(spark, n_events=2_000, n_convs=25, n_files=3, seed=9)
    changes = changes.persist()
    write_change_files(changes, d["landing"])
    config = DatasetConfig(
        name="transcripts", table_path=d["table"], num_buckets=4, salt_buckets=4,
        agg_views=[{"path": d["view"], "group": ["conv_id"], "sums": ["turn_idx"]}],
    )
    bootstrap_table(spark, config, TRANSCRIPT_SCHEMA)
    q = apply_changes(
        spark, config, d["landing"], d["ckpt"],
        schema=changes.schema, max_files_per_trigger=1,  # several epochs
    )
    q.awaitTermination(240)
    changes.unpersist()

    src = LakeTable(spark, d["table"])
    view = LakeTable(spark, d["view"])
    _assert_view_matches_recompute(src, view, group_col="conv_id")
    # checkpoint replay: neither table nor view advances
    v_tbl, v_view = src.current_version(), view.current_version()
    q = apply_changes(
        spark, config, d["landing"], d["ckpt"], schema=None
    )
    q.awaitTermination(120)
    assert src.current_version() == v_tbl
    assert view.current_version() == v_view
