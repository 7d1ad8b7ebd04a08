"""Merge-on-read write mode: delta-file merges must be observationally
identical to copy-on-write (same final state vs the replay oracle), with
O(batch) write amplification, correct late/duplicate handling via
read-time LWW, and compaction folding deltas into the base."""

import pandas as pd
from pyspark.sql import functions as F

from dataingestion_spark import oracle
from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA, assert_table_equals_oracle


def _mk(spark, path, buckets=4):
    return LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=buckets,
    )


def _epochs(changes, n):
    lsns = [r[0] for r in changes.select("lsn").distinct().collect()]
    hi = max(lsns) + 1
    step = hi // n + 1
    return [
        changes.filter((F.col("lsn") >= i * step) & (F.col("lsn") < (i + 1) * step))
        for i in range(n)
    ]


def test_mor_matches_oracle_and_cow(spark, tmp_path):
    changes = gen_changes(
        spark, n_events=6_000, n_convs=50, n_files=4, seed=21, dup_frac=0.1
    )
    changes.persist()
    expected = oracle.replay(changes.toPandas())

    mor = _mk(spark, tmp_path / "mor")
    cow = _mk(spark, tmp_path / "cow")
    for e, part in enumerate(_epochs(changes, 3)):
        mor.merge(part, pipeline_id="m", epoch_id=e, write_mode="mor")
        cow.merge(part, pipeline_id="c", epoch_id=e, write_mode="cow")

    assert_table_equals_oracle(mor.read(), expected)
    assert_table_equals_oracle(cow.read(), expected)

    # MOR accumulated deltas and never rewrote the base
    snap = mor.snapshot()
    assert any(snap.deltas.values())
    assert snap.operation == "merge-mor"
    changes.unpersist()


def test_mor_compaction_folds_deltas(spark, tmp_path):
    changes = gen_changes(spark, n_events=3_000, n_convs=30, n_files=2, seed=22)
    changes.persist()
    expected = oracle.replay(changes.toPandas())
    tbl = _mk(spark, tmp_path / "t")
    for e, part in enumerate(_epochs(changes, 2)):
        tbl.merge(part, pipeline_id="m", epoch_id=e, write_mode="mor")

    before = tbl.read().toPandas()
    snap = tbl.compact()
    assert not any(snap.deltas.values()), "compaction must clear deltas"
    assert_table_equals_oracle(tbl.read(), expected)
    after = tbl.read().toPandas()
    cols = ["conv_id", "turn_idx", "text"]
    pd.testing.assert_frame_equal(
        before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)[cols],
        after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)[cols],
    )
    changes.unpersist()


def test_mor_late_lower_lsn_does_not_overwrite(spark, tmp_path):
    tbl = _mk(spark, tmp_path / "t")
    rows = [
        ("INSERT", "c1", 0, "user", "v1", None, "2024-01-01 00:00:00", 10),
        ("UPDATE", "c1", 0, "user", "v2", None, "2024-01-01 00:01:00", 20),
    ]
    schema = "op string, conv_id string, turn_idx int, role string, text string, tool string, ts string, lsn long"
    df = spark.createDataFrame(rows, schema).withColumn("ts", F.to_timestamp("ts"))
    tbl.merge(df, pipeline_id="p", epoch_id=0, write_mode="mor")
    # late re-delivery of the OLD version in a later epoch
    late = spark.createDataFrame([rows[0]], schema).withColumn("ts", F.to_timestamp("ts"))
    tbl.merge(late, pipeline_id="p", epoch_id=1, write_mode="mor")
    got = tbl.read().toPandas()
    assert list(got["text"]) == ["v2"]

    # DELETE tombstone wins over lower-lsn data across deltas
    delete = spark.createDataFrame(
        [("DELETE", "c1", 0, None, None, None, "2024-01-01 00:02:00", 30)], schema
    ).withColumn("ts", F.to_timestamp("ts"))
    tbl.merge(delete, pipeline_id="p", epoch_id=2, write_mode="mor")
    assert tbl.read().count() == 0
    # ...even if the old insert is re-delivered once more
    tbl.merge(late, pipeline_id="p", epoch_id=3, write_mode="mor")
    assert tbl.read().count() == 0


def test_mor_schema_evolution_mid_stream(spark, tmp_path):
    """v1 epochs as MOR deltas, then a v2 epoch (adds tool_meta,
    latency_ms): the evolved read must null-fill v1 base/delta rows and
    the LWW resolution must span the schema change."""
    from pyspark.sql import functions as F

    changes_v1 = gen_changes(spark, n_events=2_000, n_convs=25, seed=31)
    changes_v2 = gen_changes(
        spark, n_events=2_000, n_convs=25, seed=31, schema_version=2,
        lsn_offset=1_000_000,
    )
    changes_v1.persist(), changes_v2.persist()
    tbl = _mk(spark, tmp_path / "t")
    tbl.merge(changes_v1, pipeline_id="m", epoch_id=0, write_mode="mor")
    tbl.merge(changes_v2, pipeline_id="m", epoch_id=1, write_mode="mor")

    assert [f.name for f in tbl.snapshot().schema.fields][-2:] == [
        "tool_meta", "latency_ms",
    ]
    union = changes_v1.withColumn(
        "tool_meta", F.lit(None).cast("string")
    ).withColumn("latency_ms", F.lit(None).cast("long")).unionByName(changes_v2)
    expected = oracle.replay(
        union.toPandas(), extra_payload_cols=["tool_meta", "latency_ms"]
    )
    assert_table_equals_oracle(
        tbl.read(), expected,
        payload_cols=["role", "text", "tool", "ts", "tool_meta", "latency_ms"],
    )
    # compaction after evolution keeps the same state
    tbl.compact()
    assert_table_equals_oracle(
        tbl.read(), expected,
        payload_cols=["role", "text", "tool", "ts", "tool_meta", "latency_ms"],
    )
    changes_v1.unpersist(), changes_v2.unpersist()


def test_cow_merge_folds_outstanding_deltas(spark, tmp_path):
    """A COW merge on a table with outstanding MOR deltas must see the
    delta rows (resolved join input) and clear them for touched buckets."""
    changes = gen_changes(spark, n_events=2_000, n_convs=20, n_files=2, seed=23)
    changes.persist()
    expected = oracle.replay(changes.toPandas())
    tbl = _mk(spark, tmp_path / "t")
    parts = _epochs(changes, 2)
    tbl.merge(parts[0], pipeline_id="m", epoch_id=0, write_mode="mor")
    tbl.merge(parts[1], pipeline_id="m", epoch_id=1, write_mode="cow")
    assert_table_equals_oracle(tbl.read(), expected)
    changes.unpersist()


def test_maybe_compact_only_due_buckets(spark, tmp_path):
    """maybe_compact folds only buckets whose delta chain reached the
    limit; healthy buckets keep their deltas; state is unchanged.

    The fixture builds uneven chains BY CONSTRUCTION: epochs 0-1 apply
    whole batches (every bucket +1 delta), then epochs 2-3's rows are
    split along the engine's own bucket assignment - buckets 0-3 get
    each part as its own merge (+2 deltas) while buckets 4-7's rows
    land in one combined merge (+1 delta). Every source row is still
    applied exactly once, so the oracle replay is unaffected. (Before
    the hot-key absolute row floor, salting incidentally produced this
    variance by splitting hot buckets' epochs into per-salt delta
    files; the fixture now states its own assumption.)"""
    from dataingestion_spark.lake.table import bucket_expr

    changes = gen_changes(spark, n_events=3_000, n_convs=40, n_files=4, seed=24)
    changes.persist()
    expected = oracle.replay(changes.toPandas())
    tbl = _mk(spark, tmp_path / "t", buckets=8)
    parts = _epochs(changes, 4)
    deep = bucket_expr("conv_id", 8) < 4
    tbl.merge(parts[0], pipeline_id="m", epoch_id=0, write_mode="mor")
    tbl.merge(parts[1], pipeline_id="m", epoch_id=1, write_mode="mor")
    tbl.merge(parts[2].filter(deep), pipeline_id="m", epoch_id=2, write_mode="mor")
    tbl.merge(parts[3].filter(deep), pipeline_id="m", epoch_id=3, write_mode="mor")
    tbl.merge(
        parts[2].filter(~deep).unionByName(parts[3].filter(~deep)),
        pipeline_id="m",
        epoch_id=4,
        write_mode="mor",
    )
    snap = tbl.snapshot()
    chains = {b: len(fl) for b, fl in snap.deltas.items() if fl}
    limit = max(chains.values())  # only the deepest chains are due
    due = {b for b, n in chains.items() if n >= limit}
    assert due and due != set(chains), "fixture must leave healthy buckets"

    out = tbl.maybe_compact(max_delta_files_per_bucket=limit)
    assert out is not None
    after = tbl.snapshot()
    assert all(not after.deltas.get(b) for b in due), "due buckets compacted"
    healthy = set(chains) - due
    assert any(after.deltas.get(b) for b in healthy), "healthy deltas kept"
    assert_table_equals_oracle(tbl.read(), expected)

    # nothing due -> no-op, no new snapshot
    v = tbl.current_version()
    assert tbl.maybe_compact(max_delta_files_per_bucket=10_000) is None
    assert tbl.current_version() == v
    changes.unpersist()


def test_apply_changes_auto_compaction(spark, tmp_path):
    """compact_delta_files in the dataset config bounds MOR delta chains
    through the streaming apply path."""
    from dataingestion_spark.config import DatasetConfig
    from dataingestion_spark.sources.datagen import write_change_files
    from dataingestion_spark.streaming.pipeline import apply_changes, bootstrap_table

    landing = tmp_path / "landing"
    changes = gen_changes(spark, n_events=2_000, n_convs=25, n_files=4, seed=25)
    changes.persist()
    write_change_files(changes, landing)
    cfg = DatasetConfig(
        name="autocompact",
        table_path=str(tmp_path / "table"),
        num_buckets=4,
        write_mode="mor",
        compact_delta_files=2,
    )
    bootstrap_table(spark, cfg, TRANSCRIPT_SCHEMA)
    q = apply_changes(
        spark, cfg, str(landing), str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination()
    tbl = LakeTable(spark, cfg.table_path)
    snap = tbl.snapshot()
    assert all(len(fl) < 2 + 1 for fl in snap.deltas.values()), snap.deltas
    expected = oracle.replay(changes.toPandas())
    assert_table_equals_oracle(tbl.read(), expected)
    changes.unpersist()
