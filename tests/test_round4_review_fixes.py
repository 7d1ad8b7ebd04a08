"""Regression pins for the round-4 mid-round review findings: rename vs
name-keyed metadata (sort order, bloom/NDV specs), requeue cursor
recoverability, router NULL discriminators + dropped-row lineage,
optimize resilience to broken index specs, and merge_into assignments
to columns the source doesn't carry."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark import oracle
from dataingestion_spark.config import DatasetConfig
from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.datagen import gen_changes, write_change_files
from dataingestion_spark.streaming.lineage import LineageLog
from dataingestion_spark.streaming.pipeline import bootstrap_table, route_changes
from tests.util import TRANSCRIPT_SCHEMA, assert_table_equals_oracle


def _table(spark, tmp_path, name="t", n_events=2_000):
    tbl = LakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=4,
    )
    tbl.merge(
        gen_changes(spark, n_events=n_events, n_convs=30, seed=41),
        pipeline_id="p", epoch_id=0,
    )
    return tbl


def test_rename_remaps_sort_order_and_index_specs(spark, tmp_path):
    """A metadata-only rename must carry every name-keyed piece of table
    metadata with it, or the next maintenance pass crashes on a column
    that still exists under its new name."""
    from dataingestion_spark.lake.bloom import BloomIndexStore
    from dataingestion_spark.lake.ndv import NdvStore

    tbl = _table(spark, tmp_path)
    tbl.set_sort_order(["ts", "turn_idx"], mode="zorder")
    tbl.update_bloom_index()
    tbl.update_ndv_sketch(["tool", "role"])
    ndv_before = tbl.approx_ndv("tool", refresh=False)

    tbl.rename_column("ts", "event_ts")
    tbl.rename_column("tool", "tool_name")
    tbl.rename_column("conv_id", "cid")  # pk rename

    assert tbl.sort_order() == {"cols": ["event_ts", "turn_idx"], "mode": "zorder"}
    assert BloomIndexStore(tbl.root).spec()["pk_fields"] == ["cid", "turn_idx"]
    assert NdvStore(tbl.root).spec()["cols"] == ["role", "tool_name"]
    # bucket sketches moved with the name: the stored estimate survives
    # without any refresh job
    assert tbl.approx_ndv("tool_name", refresh=False) == ndv_before

    # the maintenance pass that used to crash now runs end to end
    report = tbl.optimize(max_delta_files_per_bucket=1, keep_snapshots=2)
    assert "error" not in report["indexes"].get("bloom", {})
    assert "error" not in report["indexes"].get("ndv", {})
    assert tbl.verify_integrity(check_data=False)["ok"]
    # and compaction under the renamed sort order still works
    snap = tbl.compact(max_records_per_file=500)
    assert snap.summary["cluster_cols"] == ["event_ts", "turn_idx"]


def test_optimize_survives_broken_index_spec(spark, tmp_path):
    """A stale/corrupt index spec must not starve expiry and vacuum."""
    from dataingestion_spark.lake.ndv import NdvStore

    tbl = _table(spark, tmp_path, name="t2")
    tbl.update_ndv_sketch(["conv_id"])
    store = NdvStore(tbl.root)
    spec = store.spec()
    spec["cols"] = ["gone_column"]  # simulate crash-mid-rename staleness
    store.write_spec(spec)
    for _ in range(4):
        tbl.merge(
            gen_changes(spark, n_events=200, n_convs=10, seed=7),
            pipeline_id="x", epoch_id=None,
        )
    report = tbl.optimize(keep_snapshots=1, vacuum_older_than_s=0.0)
    assert "error" in report["indexes"]["ndv"]
    assert report["expired_snapshots"]  # downstream steps still ran
    assert sum(report["vacuumed"].values()) >= 0


def test_requeue_fresh_pipeline_id_recovers_after_bad_fix(spark, tmp_path):
    from dataingestion_spark.sources.quarantine import requeue_quarantine
    from dataingestion_spark.streaming.pipeline import apply_changes

    d = {k: str(tmp_path / k) for k in ("landing", "ckpt", "table", "dlq")}
    changes = gen_changes(spark, n_events=1_500, n_convs=20, seed=51).persist()
    poisoned = changes.withColumn(
        "op",
        F.when(
            (F.col("lsn") % 7 == 0) & (F.col("op") == "INSERT"), F.lit("XX")
        ).otherwise(F.col("op")),
    )
    write_change_files(poisoned, d["landing"])
    config = DatasetConfig(
        name="transcripts", table_path=d["table"], num_buckets=4, salt_buckets=4
    )
    bootstrap_table(spark, config, TRANSCRIPT_SCHEMA)
    q = apply_changes(
        spark, config, d["landing"], d["ckpt"],
        schema=poisoned.schema, quarantine_dir=d["dlq"],
    )
    q.awaitTermination(240)
    pdf = changes.toPandas()
    changes.unpersist()
    bad = (pdf["lsn"] % 7 == 0) & (pdf["op"] == "INSERT")
    tbl = LakeTable(spark, d["table"])

    # run 1: a WRONG fix cures nothing; epochs get marked anyway
    wrong = requeue_quarantine(
        tbl, d["dlq"], fix=lambda df: df.withColumn("text", F.lit("noop"))
    )
    assert wrong["requeued"] == 0 and wrong["still_invalid"]
    # same (default) cursor: replay skips, rows look stranded
    again = requeue_quarantine(
        tbl, d["dlq"],
        fix=lambda df: df.withColumn(
            "op", F.when(F.col("op") == "XX", F.lit("INSERT")).otherwise(F.col("op"))
        ),
    )
    assert again["epochs"] == 0 and again["skipped_epochs"] > 0

    # a FRESH pipeline id replays the immutable DLQ with the right fix
    fixed = requeue_quarantine(
        tbl, d["dlq"], pipeline_id="requeue::take2",
        fix=lambda df: df.withColumn(
            "op", F.when(F.col("op") == "XX", F.lit("INSERT")).otherwise(F.col("op"))
        ),
    )
    assert fixed["pipeline_id"] == "requeue::take2"
    assert fixed["requeued"] == int(bad.sum())
    assert_table_equals_oracle(tbl.read(), oracle.replay(pdf))


def test_router_null_discriminator_fails_fast_and_ignore_counts(spark, tmp_path):
    d = {k: str(tmp_path / k) for k in ("landing", "ta", "lineage")}
    changes = gen_changes(spark, n_events=1_000, n_convs=20, seed=61).persist()
    tagged = changes.withColumn(
        "table",
        F.when(F.col("lsn") % 5 == 0, F.lit(None)).otherwise(F.lit("main")),
    )
    write_change_files(tagged, d["landing"])
    pdf = changes.toPandas()
    changes.unpersist()
    routes = {
        "main": DatasetConfig(
            name="main", table_path=d["ta"], num_buckets=4, salt_buckets=4
        )
    }
    bootstrap_table(spark, routes["main"], TRANSCRIPT_SCHEMA)

    q = route_changes(
        spark, routes, d["landing"], str(tmp_path / "ckpt_fail")
    )
    try:
        q.awaitTermination(240)
        err = q.exception()
    except Exception as e:  # noqa: BLE001
        err = e
    assert err is not None and "<NULL>" in str(err)

    q = route_changes(
        spark, routes, d["landing"], str(tmp_path / "ckpt_ign"),
        on_unrouted="ignore", lineage_path=d["lineage"],
    )
    q.awaitTermination(240)
    keep = pdf["lsn"] % 5 != 0
    assert_table_equals_oracle(
        LakeTable(spark, d["ta"]).read(), oracle.replay(pdf[keep])
    )
    lin = LineageLog(spark, d["lineage"]).read().toPandas()
    dropped = lin[lin.status == "DROPPED_UNROUTED"]
    assert dropped.event_count.sum() == int((~keep).sum())


def test_merge_into_assignment_to_column_absent_from_source(spark, tmp_path):
    tbl = _table(spark, tmp_path, name="t3")
    src = (
        tbl.read()
        .filter("tool IS NOT NULL")
        .limit(8)
        .select("conv_id", "turn_idx", "role", "text", "ts")  # no 'tool'
        .persist()
    )
    keys = [(r.conv_id, int(r.turn_idx)) for r in src.collect()]
    tbl.merge_into(
        src,
        when_matched_update=True,
        update_assignments={"tool": "forced", "text": "[t]"},
    )
    kdf = spark.createDataFrame(keys, "conv_id string, turn_idx int")
    for r in tbl.read_keys(kdf).collect():
        assert (r.tool, r.text) == ("forced", "[t]")
    src.unpersist()
