"""Incremental changelog reads (LakeTable.read_changes): the net
INSERT/UPDATE/DELETE diff between two snapshots, the Iceberg
changelog-scan / Hudi incremental-query analog a CDC consumer chains off
the lake. The reference verifies pipelines by comparing final table
states (demo/test_pipeline.sh:225-286); the changelog generalizes that
comparison into a queryable operator, and the invariant test here applies
a diff to the older state and requires the newer state back."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA

CHANGE_DDL = (
    "op string, conv_id string, turn_idx int, role string, text string, "
    "tool string, ts long, lsn long, source_file string"
)


def _make_table(spark, path, num_buckets=8):
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


def _changes_pdf(tbl, v_from, v_to=None, **kw) -> pd.DataFrame:
    return (
        tbl.read_changes(v_from, v_to, **kw)
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "change_type"])
        .reset_index(drop=True)
    )


def test_insert_update_delete_classification(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir)
    tbl.merge(
        _batch(
            spark,
            [
                ("INSERT", "c1", 0, "user", "hello", None, 100, 10, "f0"),
                ("INSERT", "c1", 1, "assistant", "hi", None, 101, 11, "f0"),
                ("INSERT", "c2", 0, "user", "other", None, 102, 12, "f0"),
            ],
        ),
        pipeline_id="t",
        epoch_id=0,
    )
    v1 = tbl.current_version()
    tbl.merge(
        _batch(
            spark,
            [
                ("UPDATE", "c1", 0, "user", "hello v2", None, 103, 20, "f1"),
                ("DELETE", "c1", 1, None, None, None, 104, 21, "f1"),
                ("INSERT", "c3", 0, "tool", "new", "tool_01", 105, 22, "f1"),
            ],
        ),
        pipeline_id="t",
        epoch_id=1,
    )
    got = _changes_pdf(tbl, v1)
    assert list(got["change_type"]) == ["update", "delete", "insert"]
    assert list(got["conv_id"]) == ["c1", "c1", "c3"]
    assert list(got["turn_idx"]) == [0, 1, 0]
    # post-image for the update, PRE-image payload for the delete
    assert got.loc[0, "text"] == "hello v2"
    assert got.loc[1, "text"] == "hi"
    assert got.loc[2, "tool"] == "tool_01"
    # untouched key c2/0 emits nothing
    assert not ((got["conv_id"] == "c2")).any()


def test_update_preimages_delta_cdf_style(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir)
    tbl.merge(
        _batch(spark, [("INSERT", "c1", 0, "user", "old", None, 100, 10, "f0")]),
        pipeline_id="t",
        epoch_id=0,
    )
    v1 = tbl.current_version()
    tbl.merge(
        _batch(spark, [("UPDATE", "c1", 0, "user", "new", None, 101, 20, "f1")]),
        pipeline_id="t",
        epoch_id=1,
    )
    got = _changes_pdf(tbl, v1, include_preimages=True)
    assert list(got["change_type"]) == ["update_postimage", "update_preimage"]
    by_type = got.set_index("change_type")["text"]
    assert by_type["update_preimage"] == "old"
    assert by_type["update_postimage"] == "new"


def test_net_semantics_and_empty_ranges(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir)
    v0 = tbl.current_version()
    tbl.merge(
        _batch(spark, [("INSERT", "c1", 0, "user", "a", None, 100, 10, "f0")]),
        pipeline_id="t",
        epoch_id=0,
    )
    # transient key: inserted then deleted strictly inside the range
    tbl.merge(
        _batch(spark, [("INSERT", "c9", 9, "user", "gone", None, 101, 20, "f1")]),
        pipeline_id="t",
        epoch_id=1,
    )
    tbl.merge(
        _batch(spark, [("DELETE", "c9", 9, None, None, None, 102, 30, "f2")]),
        pipeline_id="t",
        epoch_id=2,
    )
    # from == to -> empty
    assert tbl.read_changes(tbl.current_version()).count() == 0
    got = _changes_pdf(tbl, v0)
    # net diff: transient c9 emits nothing; from the empty create snapshot
    # everything live is an insert and equals read()
    assert list(got["change_type"]) == ["insert"]
    assert list(got["conv_id"]) == ["c1"]
    with pytest.raises(ValueError):
        tbl.read_changes(tbl.current_version(), v0)


def _apply_diff(state: pd.DataFrame, diff: pd.DataFrame) -> pd.DataFrame:
    """Replay a changelog onto a state snapshot: delete removed/updated
    keys, insert the post-images."""
    pk = ["conv_id", "turn_idx"]
    cols = list(state.columns)
    touched = diff[diff["change_type"].isin(["update", "delete"])][pk]
    keep = state.merge(touched, on=pk, how="left", indicator=True)
    keep = keep[keep["_merge"] == "left_only"][cols]
    add = diff[diff["change_type"].isin(["insert", "update"])][cols]
    return pd.concat([keep, add], ignore_index=True)


def test_changelog_reconstructs_every_adjacent_state(spark, tmp_table_dir):
    """Invariant: state(v_from) + read_changes(v_from, v_to) == state(v_to)
    for every adjacent snapshot pair of a multi-epoch replay."""
    changes = gen_changes(
        spark, n_events=4_000, n_convs=40, max_turns=20, n_files=4, seed=77,
        dup_frac=0.1,
    )
    changes.persist()
    tbl = _make_table(spark, tmp_table_dir)
    files = sorted(r[0] for r in changes.select("source_file").distinct().collect())
    versions = [tbl.current_version()]
    for epoch, f in enumerate(files):
        tbl.merge(
            changes.filter(F.col("source_file") == f), pipeline_id="t", epoch_id=epoch
        )
        versions.append(tbl.current_version())
    changes.unpersist()
    pk = ["conv_id", "turn_idx"]

    def state(v):
        return (
            tbl.read(version=v)
            .toPandas()
            .sort_values(pk)
            .reset_index(drop=True)
        )

    for v_from, v_to in zip(versions, versions[1:]):
        diff = tbl.read_changes(v_from, v_to).toPandas()
        rebuilt = (
            _apply_diff(state(v_from), diff).sort_values(pk).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(rebuilt, state(v_to), check_dtype=False)
    # and across the whole range in one call
    diff = tbl.read_changes(versions[0], versions[-1]).toPandas()
    rebuilt = (
        _apply_diff(state(versions[0]), diff).sort_values(pk).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rebuilt, state(versions[-1]), check_dtype=False)


def test_changed_bucket_pruning(spark, tmp_table_dir):
    """A single-key epoch touches one bucket; the changelog between the
    surrounding snapshots must inspect only that bucket."""
    tbl = _make_table(spark, tmp_table_dir, num_buckets=16)
    wide = gen_changes(spark, n_events=2_000, n_convs=30, seed=3)
    tbl.merge(wide, pipeline_id="t", epoch_id=0)
    v1 = tbl.current_version()
    tbl.merge(
        _batch(spark, [("INSERT", "c_solo", 0, "user", "x", None, 900, 10**6, "f9")]),
        pipeline_id="t",
        epoch_id=1,
    )
    changed = tbl.changed_buckets(v1)
    assert len(changed) == 1
    got = _changes_pdf(tbl, v1)
    assert list(got["conv_id"]) == ["c_solo"]


def test_changelog_over_mor_deltas(spark, tmp_table_dir):
    """Delta-only commits (write_mode='mor') change no base files; the
    changed-bucket scan must still see them via the delta manifests."""
    tbl = _make_table(spark, tmp_table_dir)
    tbl.merge(
        _batch(spark, [("INSERT", "c1", 0, "user", "old", None, 100, 10, "f0")]),
        pipeline_id="t",
        epoch_id=0,
        write_mode="mor",
    )
    v1 = tbl.current_version()
    tbl.merge(
        _batch(
            spark,
            [
                ("UPDATE", "c1", 0, "user", "new", None, 101, 20, "f1"),
                ("INSERT", "c2", 0, "user", "born", None, 102, 21, "f1"),
            ],
        ),
        pipeline_id="t",
        epoch_id=1,
        write_mode="mor",
    )
    got = _changes_pdf(tbl, v1)
    assert list(got["change_type"]) == ["update", "insert"]
    assert got.loc[0, "text"] == "new"


def test_changelog_across_schema_evolution(spark, tmp_table_dir):
    """A column added inside the range: rows differing only in the new
    column diff as updates with a null pre-image for it (the from-side is
    read under the to-snapshot's wider schema, the time-travel null-fill
    path)."""
    tbl = _make_table(spark, tmp_table_dir)
    tbl.merge(
        _batch(spark, [("INSERT", "c1", 0, "user", "t", None, 100, 10, "f0")]),
        pipeline_id="t",
        epoch_id=0,
    )
    v1 = tbl.current_version()
    evolved = spark.createDataFrame(
        [("UPDATE", "c1", 0, "user", "t", None, 101, 20, "f1", "claude-3")],
        CHANGE_DDL + ", model string",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    tbl.merge(evolved, pipeline_id="t", epoch_id=1)
    got = tbl.read_changes(v1).toPandas()
    assert list(got["change_type"]) == ["update"]
    assert got.loc[0, "model"] == "claude-3"
    pre = tbl.read_changes(v1, include_preimages=True).toPandas()
    pre = pre.set_index("change_type")
    assert pd.isna(pre.loc["update_preimage", "model"])
    assert pre.loc["update_postimage", "model"] == "claude-3"
