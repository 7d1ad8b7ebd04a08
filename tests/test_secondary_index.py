"""Secondary-column bloom index (Hudi 1.0 secondary-index analog):
value -> candidate buckets for columns the pk bucketing does not hash.
Exactness rule under test: pruning is BUCKET-granular, so a stale match
superseded by a newer MOR overlay can never leak - a winning row
carries value V only if some physical row in its bucket does."""

import pytest
from pyspark.sql import functions as F, types as T

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA


def _table(spark, tmp_path, name="t", num_buckets=8):
    tbl = LakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=num_buckets,
    )
    ch = gen_changes(spark, n_events=4_000, n_convs=60, seed=33)
    # per-conversation tool tag: a tool value lives in exactly the
    # bucket(s) its conversation hashes to - the selective-value case a
    # secondary index exists for
    ch = ch.withColumn(
        "tool",
        F.when(
            F.col("tool").isNotNull(), F.concat(F.lit("t_"), F.col("conv_id"))
        ),
    )
    tbl.merge(ch, pipeline_id="p", epoch_id=0)
    return tbl


def test_read_in_equality_and_bucket_pruning(spark, tmp_path):
    tbl = _table(spark, tmp_path)
    out = tbl.update_secondary_index("tool")
    assert out["applied"] and out["covered_files"] > 0
    assert tbl.secondary_index_cols() == ["tool"]
    # a second call is idempotent
    assert not tbl.update_secondary_index("tool")["applied"]

    conv = tbl.read().filter("tool IS NOT NULL").first().conv_id
    value = f"t_{conv}"
    want = (
        tbl.read().filter(F.col("tool") == value)
        .orderBy("conv_id", "turn_idx").collect()
    )
    got = (
        tbl.read_in("tool", [value])
        .orderBy("conv_id", "turn_idx").collect()
    )
    assert got == want and len(got) > 0
    # the index pruned to the value's bucket(s), not the table
    kept, _ = tbl._secondary_prune(tbl.snapshot(), "tool", [value])
    assert len(kept) < 8
    # absent value: every bucket provably value-free -> empty, no scan
    assert tbl._secondary_prune(tbl.snapshot(), "tool", ["t_nope"]) == ([], {})
    assert tbl.read_in("tool", ["t_nope"]).count() == 0
    # no index for the column -> full scan fallback, same answer
    assert (
        tbl.read_in("role", ["assistant"]).count()
        == tbl.read().filter("role = 'assistant'").count()
    )


def test_mor_overlay_supersedes_stale_match(spark, tmp_path):
    """THE soundness case: key K's base row has tool=V, a NEWER MOR
    delta row changes it - read_in('tool', [V]) must not return K, and
    the index must not have pruned away the delta that proves it."""
    tbl = _table(spark, tmp_path, name="mor")
    tbl.update_secondary_index("tool")
    victim = tbl.read().filter("tool IS NOT NULL").first()
    value = victim.tool
    retag = spark.createDataFrame(
        [(
            victim.conv_id, int(victim.turn_idx), victim.role, victim.text,
            "t_retagged", victim.ts, "UPDATE", 10_000_000,
        )],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, op string, lsn long",
    )
    tbl.merge(retag, pipeline_id="p", epoch_id=1, write_mode="mor")
    # index NOT refreshed: the new delta file is unindexed -> its bucket
    # stays kept, resolution sees the overlay, the stale match drops out
    got = tbl.read_in("tool", [value]).filter(
        (F.col("conv_id") == victim.conv_id)
        & (F.col("turn_idx") == victim.turn_idx)
    )
    assert got.count() == 0
    assert tbl.read_in("tool", ["t_retagged"]).count() == 1
    # after a refresh the answers are identical
    tbl.update_secondary_index("tool")
    assert tbl.read_in("tool", ["t_retagged"]).count() == 1


def test_rename_moves_index_and_spec_guard(spark, tmp_path):
    tbl = _table(spark, tmp_path, name="rn")
    tbl.update_secondary_index("tool")
    with pytest.raises(ValueError, match="one index, one hash family"):
        tbl.update_secondary_index("tool", bits_per_key=16)
    tbl.update_secondary_index("tool", bits_per_key=16, rebuild=True)

    tbl.rename_column("tool", "tool_tag")
    assert tbl.secondary_index_cols() == ["tool_tag"]
    conv = tbl.read().filter("tool_tag IS NOT NULL").first().conv_id
    value = f"t_{conv}"
    assert tbl.read_in("tool_tag", [value]).count() > 0
    kept, _ = tbl._secondary_prune(tbl.snapshot(), "tool_tag", [value])
    assert len(kept) < 8  # bitmaps survived the rename unrebuilt

    report = tbl.optimize(keep_snapshots=2)
    assert "error" not in report["indexes"]["secondary:tool_tag"]

    with pytest.raises(ValueError, match="not indexable"):
        tbl.update_secondary_index("ts")
    with pytest.raises(ValueError, match="no such column"):
        tbl.read_in("nope", ["x"])


def test_file_level_pruning_on_overlay_free_buckets(spark, tmp_path):
    """Round-4 verdict item #4: inside a bucket with NO unresolved MOR
    deltas, base files stand alone, so pruning individual files whose
    blooms provably lack the value is exact - post-compaction lookups
    touch a subset of the kept buckets' files. A delta-carrying bucket
    stays all-or-nothing (the MOR soundness pin)."""
    tbl = _table(spark, tmp_path, name="flp")
    # split each bucket into several files, clustered by tool so the
    # per-file blooms are selective
    tbl.compact(cluster_cols=["tool"], max_records_per_file=60)
    tbl.update_secondary_index("tool")
    snap = tbl.snapshot()
    assert not any(snap.deltas.values())

    conv = tbl.read().filter("tool IS NOT NULL").first().conv_id
    value = f"t_{conv}"
    kept, file_map = tbl._secondary_prune(snap, "tool", [value])
    kept_file_count = sum(len(v) for v in file_map.values())
    base_in_kept = sum(len(snap.files.get(str(b), [])) for b in kept)
    assert 0 < kept_file_count < base_in_kept, (
        "expected SUB-bucket pruning on a compacted, clustered table"
    )
    # answers identical to the unpruned path
    want = (
        tbl.read_in("tool", [value], use_index=False)
        .orderBy("conv_id", "turn_idx").collect()
    )
    got = (
        tbl.read_in("tool", [value])
        .orderBy("conv_id", "turn_idx").collect()
    )
    assert got == want and len(got) > 0

    # now dirty ONE bucket with a MOR delta: that bucket reverts to
    # all-or-nothing while clean buckets keep file-level pruning
    victim = tbl.read().filter(F.col("tool") == value).first()
    retag = spark.createDataFrame(
        [(
            victim.conv_id, int(victim.turn_idx), victim.role, victim.text,
            "t_other", victim.ts, "UPDATE", 99_000_000,
        )],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, op string, lsn long",
    )
    tbl.merge(retag, pipeline_id="p", epoch_id=7, write_mode="mor")
    snap2 = tbl.snapshot()
    dirty = [b for b, fl in snap2.deltas.items() if fl]
    assert dirty
    kept2, file_map2 = tbl._secondary_prune(snap2, "tool", [value])
    for b in dirty:
        if int(b) in kept2:
            assert file_map2[b] == list(snap2.files.get(b, [])), (
                "delta-carrying bucket must keep ALL base files"
            )
    # and the overlay still supersedes the stale match
    hit = tbl.read_in("tool", [value]).filter(
        (F.col("conv_id") == victim.conv_id)
        & (F.col("turn_idx") == victim.turn_idx)
    )
    assert hit.count() == 0
