"""Optimistic commit retries (Iceberg's commit loop): losers of the
O_EXCL snapshot race re-run against the winner's state. The reference
targets 100+ concurrent datasets (PERFORMANCE_TUNING_GUIDE.md:15);
within ONE table the real-world race is maintenance (compaction) against
the ingest writer."""

import threading

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.lake.table import CommitConflictError
from dataingestion_spark import oracle
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA, assert_table_equals_oracle


def _make_table(spark, path):
    return LakeTable.create(
        spark,
        path,
        TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"],
        order_fields=["lsn", "ts"],
        num_buckets=4,
    )


def test_retry_reruns_until_success_and_gives_up(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise CommitConflictError("lost the race")
        return "ok"

    assert tbl._retry_commit(flaky) == "ok"
    assert calls["n"] == 3

    def hopeless():
        raise CommitConflictError("always")

    with pytest.raises(CommitConflictError):
        tbl._retry_commit(hopeless)


def test_concurrent_merges_same_table_both_land(spark, tmp_table_dir):
    """Two writers (two handles, two pipelines) merging concurrently into
    ONE table: the loser retries against the winner's snapshot and both
    batches land; final state equals the oracle over the union."""
    tbl_a = _make_table(spark, tmp_table_dir)
    tbl_b = LakeTable(spark, tmp_table_dir)
    b1 = gen_changes(spark, n_events=1_500, n_convs=25, seed=31, n_files=1)
    b2 = gen_changes(
        spark, n_events=1_500, n_convs=25, seed=32, n_files=1, lsn_offset=100_000
    )
    b1.persist().count()
    b2.persist().count()
    errs = []

    def run(handle, batch, pid):
        try:
            handle.merge(batch, pipeline_id=pid, epoch_id=0)
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    t1 = threading.Thread(target=run, args=(tbl_a, b1, "p1"))
    t2 = threading.Thread(target=run, args=(tbl_b, b2, "p2"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    expected = oracle.replay(b1.unionByName(b2).toPandas())
    b1.unpersist(); b2.unpersist()
    assert_table_equals_oracle(tbl_a.read(), expected)
    # both pipelines' markers present
    assert tbl_a.last_applied_epoch("p1") == 0
    assert tbl_a.last_applied_epoch("p2") == 0


def test_compaction_racing_ingest(spark, tmp_table_dir):
    """A maintenance loop compacting while the ingest writer merges MOR
    epochs: retries on either side must preserve exact final state."""
    tbl = _make_table(spark, tmp_table_dir)
    maint = LakeTable(spark, tmp_table_dir)
    changes = gen_changes(
        spark, n_events=4_000, n_convs=30, seed=33, n_files=8, dup_frac=0.1
    )
    changes.persist().count()
    files = sorted(r[0] for r in changes.select("source_file").distinct().collect())
    errs = []
    compacted = {"n": 0}
    done = threading.Event()

    def compact_loop():
        # periodic like real maintenance - the contention-model comment on
        # LakeTable.COMMIT_RETRIES: maintenance cadence must exceed epoch
        # duration, else full-recompute retries starve the writer
        while not done.is_set():
            try:
                maint.compact()
                compacted["n"] += 1
            except CommitConflictError:
                pass  # documented: maintenance YIELDS to a busy writer
            except Exception as e:  # pragma: no cover
                errs.append(e)
                return
            done.wait(2.0)

    t = threading.Thread(target=compact_loop)
    t.start()
    try:
        for epoch, f in enumerate(files):
            tbl.merge(
                changes.filter(F.col("source_file") == f),
                pipeline_id="ingest",
                epoch_id=epoch,
                write_mode="mor",
            )
    finally:
        done.set()
        t.join()
    assert not errs, errs
    assert compacted["n"] > 0, "compaction never won a race"
    expected = oracle.replay(changes.toPandas())
    changes.unpersist()
    assert_table_equals_oracle(tbl.read(), expected)
