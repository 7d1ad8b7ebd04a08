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
        # hot cadence on purpose: the ingest side REBASES past compact
        # commits in O(ms) (see COMMIT_RETRIES contention model), so even
        # aggressive maintenance cannot starve the writer
        while not done.is_set():
            try:
                maint.compact()
                compacted["n"] += 1
            except CommitConflictError:
                pass  # documented: maintenance YIELDS to a busy writer
            except Exception as e:  # pragma: no cover
                errs.append(e)
                return
            done.wait(0.3)

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


def _stale_once(handle, stale):
    """Make the handle's next snapshot() call return a stale snapshot -
    deterministic stand-in for losing a commit race."""
    orig = handle.snapshot
    state = {"used": False}

    def snap(version=None):
        if version is None and not state["used"]:
            state["used"] = True
            return stale
        return orig(version)

    handle.snapshot = snap
    return lambda: setattr(handle, "snapshot", orig)


def _spy_rebase(monkeypatch):
    calls = {"rebase": 0, "merge_once": 0}
    orig_rb = LakeTable._rebase_onto_head
    orig_mo = LakeTable._merge_once

    def rb(self, *a, **k):
        calls["rebase"] += 1
        return orig_rb(self, *a, **k)

    def mo(self, *a, **k):
        calls["merge_once"] += 1
        return orig_mo(self, *a, **k)

    monkeypatch.setattr(LakeTable, "_rebase_onto_head", rb)
    monkeypatch.setattr(LakeTable, "_merge_once", mo)
    return calls


def _batch(spark, conv, turn, text, lsn):
    return spark.createDataFrame(
        [("INSERT", conv, turn, "user", text, None, 100 + lsn, lsn, "f")],
        "op string, conv_id string, turn_idx int, role string, text string,"
        " tool string, ts long, lsn long, source_file string",
    ).withColumn("ts", F.timestamp_seconds("ts"))


def _two_convs_in_different_buckets(spark, num_buckets=4):
    from dataingestion_spark.lake.table import bucket_expr
    from pyspark.sql import types as T

    cands = [f"conv_{i}" for i in range(32)]
    df = spark.createDataFrame([(c,) for c in cands], "conv_id string")
    rows = df.select(
        "conv_id",
        bucket_expr("conv_id", num_buckets, T.StringType()).alias("b"),
    ).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["b"], r["conv_id"])
        if len(by_bucket) >= 2:
            break
    (b1, c1), (b2, c2) = list(by_bucket.items())[:2]
    assert b1 != b2
    return c1, c2


def test_rebase_splices_disjoint_bucket_commit(spark, tmp_table_dir, monkeypatch):
    """Interloper merged a DIFFERENT bucket: the stale commit rebases at
    metadata level - the Spark job runs once, both rows land."""
    c1, c2 = _two_convs_in_different_buckets(spark)
    tbl = _make_table(spark, tmp_table_dir)
    other = LakeTable(spark, tmp_table_dir)
    stale = tbl.snapshot()
    other.merge(_batch(spark, c1, 0, "interloper", 10), pipeline_id="p1", epoch_id=0)
    calls = _spy_rebase(monkeypatch)  # after the interloper: count OUR runs only
    restore = _stale_once(tbl, stale)
    try:
        tbl.merge(_batch(spark, c2, 0, "rebased", 20), pipeline_id="p2", epoch_id=0)
    finally:
        restore()
    assert calls["rebase"] == 1
    assert calls["merge_once"] == 1, "rebase must not re-run the job"
    got = tbl.read().toPandas().sort_values("conv_id")
    assert sorted(got["text"]) == ["interloper", "rebased"]
    assert tbl.last_applied_epoch("p1") == 0 and tbl.last_applied_epoch("p2") == 0


def test_rebase_allows_compact_intervener_same_bucket(spark, tmp_table_dir, monkeypatch):
    """Interloper COMPACTED our bucket (state-preserving): splice stays
    valid, the merge job is not re-run."""
    c1, _ = _two_convs_in_different_buckets(spark)
    tbl = _make_table(spark, tmp_table_dir)
    tbl.merge(_batch(spark, c1, 0, "base", 10), pipeline_id="p", epoch_id=0)
    maint = LakeTable(spark, tmp_table_dir)
    stale = tbl.snapshot()
    maint.compact()
    calls = _spy_rebase(monkeypatch)  # after the intervener: count OUR runs only
    restore = _stale_once(tbl, stale)
    try:
        tbl.merge(_batch(spark, c1, 1, "after-compact", 20), pipeline_id="p", epoch_id=1)
    finally:
        restore()
    assert calls["rebase"] == 1 and calls["merge_once"] == 1
    got = tbl.read().toPandas().sort_values("turn_idx")
    assert list(got["text"]) == ["base", "after-compact"]


def test_rebase_refuses_merge_overlap_and_recomputes(spark, tmp_table_dir, monkeypatch):
    """Interloper MERGED the same key: splice is unsound (its rows must
    feed our LWW fold), so the commit recomputes - and the recompute's
    fold sees the interloper's row."""
    c1, _ = _two_convs_in_different_buckets(spark)
    tbl = _make_table(spark, tmp_table_dir)
    other = LakeTable(spark, tmp_table_dir)
    stale = tbl.snapshot()
    other.merge(_batch(spark, c1, 0, "older", 10), pipeline_id="p1", epoch_id=0)
    calls = _spy_rebase(monkeypatch)  # after the interloper: count OUR runs only
    restore = _stale_once(tbl, stale)
    try:
        tbl.merge(_batch(spark, c1, 0, "newer", 20), pipeline_id="p2", epoch_id=0)
    finally:
        restore()
    assert calls["rebase"] >= 1
    assert calls["merge_once"] == 2, "overlap must force a recompute"
    got = tbl.read().toPandas()
    assert list(got["text"]) == ["newer"]  # LWW by lsn across both writers


def test_rebase_refuses_dml_intervener_and_recomputes(spark, tmp_table_dir, monkeypatch):
    """Interloper ran delete_where on our bucket: a DML commit is a
    replace-style rewrite whose rows must feed our fold, so the stale
    merge recomputes - and its recompute sees the deletion (the stale
    row's lsn is below the tombstone's timeline position)."""
    c1, _ = _two_convs_in_different_buckets(spark)
    tbl = _make_table(spark, tmp_table_dir)
    other = LakeTable(spark, tmp_table_dir)
    tbl.merge(_batch(spark, c1, 0, "base", 10), pipeline_id="p", epoch_id=0)
    stale = tbl.snapshot()
    other.delete_where(F.col("conv_id") == c1)
    calls = _spy_rebase(monkeypatch)  # after the interloper: count OUR runs only
    restore = _stale_once(tbl, stale)
    try:
        # a stale-lsn update for the deleted key plus a fresh turn
        tbl.merge(_batch(spark, c1, 1, "new-turn", 9), pipeline_id="p", epoch_id=1)
    finally:
        restore()
    assert calls["merge_once"] == 2, "DML overlap must force a recompute"
    got = tbl.read().toPandas()
    # turn 0 stays deleted (tombstone at lsn 10 > nothing newer); the new
    # turn 1 row (its own key) lands
    assert list(got["turn_idx"]) == [1] and list(got["text"]) == ["new-turn"]
