"""Second-level (chunked) bucket manifests: append-only commits rewrite
only a bounded tail and share sealed chunk files structurally across
snapshots, so per-epoch metadata writes stay O(tail) instead of
O(accumulated files) over a long-running stream (SCALE.md's deferred
manifest-of-manifests, reference scale target
/root/reference/PERFORMANCE_TUNING_GUIDE.md:15)."""

import datetime
import json

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA


def _rows(spark, n, start=0):
    data = [
        (
            f"conv_{i:06d}",
            0,
            "user",
            f"text {i}",
            None,
            datetime.datetime(2026, 1, 1, 0, 0, 0),
        )
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(data, TRANSCRIPT_SCHEMA)


def _manifest(tbl, snap, bucket):
    return json.loads((tbl.root / snap.manifest_refs[bucket]).read_text())


def test_append_stream_seals_chunks_and_bounds_tail(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(LakeTable, "MANIFEST_CHUNK_ENTRIES", 3)
    tbl = LakeTable.create(
        spark, tmp_path / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["ts"], num_buckets=2,
    )
    n_appends = 8
    for e in range(n_appends):
        tbl.append(_rows(spark, 6, start=e * 6), pipeline_id="p", epoch_id=e)

    snap = tbl.snapshot()
    # files accumulated across appends; resolution sees every row
    assert sum(len(v) for v in snap.files.values()) >= n_appends
    assert tbl.read().count() == 6 * n_appends

    for b in snap.files:
        m = _manifest(tbl, snap, b)
        # long-running append stream MUST have sealed chunks by now and
        # the inline tail stays under the seal threshold
        assert m.get("chunks"), f"bucket {b} never sealed a chunk"
        assert len(m.get("files", [])) + len(m.get("deltas", [])) < 3
        # chunk resolution reproduces the full list, in order
        files, deltas = tbl._resolve_manifest(snap.manifest_refs[b])
        assert files == snap.files[b]
        assert deltas == snap.deltas.get(b, [])


def test_append_shares_sealed_chunks_across_snapshots(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(LakeTable, "MANIFEST_CHUNK_ENTRIES", 3)
    tbl = LakeTable.create(
        spark, tmp_path / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["ts"], num_buckets=2,
    )
    for e in range(8):
        tbl.append(_rows(spark, 6, start=e * 6), pipeline_id="p", epoch_id=e)
    history = tbl.history()
    for b in tbl.snapshot().files:
        prev_chunks: list[str] = []
        for snap in history:
            if b not in snap.manifest_refs:
                continue
            chunks = _manifest(tbl, snap, b).get("chunks", [])
            # sealed chunks are immutable and shared: each snapshot's
            # chunk list extends the previous one (structural sharing at
            # the chunk level, not just whole-manifest level)
            assert chunks[: len(prev_chunks)] == prev_chunks
            prev_chunks = chunks
        assert prev_chunks, f"bucket {b} sealed no chunks over the stream"


def test_mor_delta_stream_chunks_deltas(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(LakeTable, "MANIFEST_CHUNK_ENTRIES", 3)
    tbl = LakeTable.create(
        spark, tmp_path / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=2,
    )
    for e in range(8):
        batch = gen_changes(
            spark, n_events=300, n_convs=40, seed=50 + e,
            lsn_offset=e * 1000, n_files=1,
        )
        tbl.merge(batch, pipeline_id="p", epoch_id=e, write_mode="mor")
    snap = tbl.snapshot()
    assert snap.deltas, "MOR stream produced no delta files"
    chunked = [
        b for b in snap.deltas if _manifest(tbl, snap, b).get("chunks")
    ]
    assert chunked, "delta-file growth never sealed a chunk"
    for b in snap.deltas:
        files, deltas = tbl._resolve_manifest(snap.manifest_refs[b])
        assert deltas == snap.deltas[b]
        assert files == snap.files.get(b, [])
    # reads through chunked manifests stay correct: LWW over all deltas
    assert tbl.read().count() == tbl.read().select("conv_id", "turn_idx").distinct().count()


def test_compact_resets_chunks(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(LakeTable, "MANIFEST_CHUNK_ENTRIES", 3)
    tbl = LakeTable.create(
        spark, tmp_path / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=2,
    )
    for e in range(6):
        batch = gen_changes(
            spark, n_events=300, n_convs=40, seed=60 + e,
            lsn_offset=e * 1000, n_files=1,
        )
        tbl.merge(batch, pipeline_id="p", epoch_id=e, write_mode="mor")
    before = tbl.read().toPandas().sort_values(["conv_id", "turn_idx"])
    tbl.compact()
    snap = tbl.snapshot()
    assert not snap.deltas, "compact left delta files behind"
    for b in snap.files:
        m = _manifest(tbl, snap, b)
        files, deltas = tbl._resolve_manifest(snap.manifest_refs[b])
        assert files == snap.files[b] and deltas == []
        # a rewrite starts a fresh manifest lineage (no stale delta chunks)
        for cref in m.get("chunks", []):
            c = json.loads((tbl.root / cref).read_text())
            assert not c.get("deltas")
    after = tbl.read().toPandas().sort_values(["conv_id", "turn_idx"])
    assert before.reset_index(drop=True).equals(after.reset_index(drop=True))


def test_legacy_flat_manifest_still_resolves(spark, tmp_path):
    tbl = LakeTable.create(
        spark, tmp_path / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["ts"], num_buckets=2,
    )
    mdir = tbl.root / "_meta" / "manifests"
    mdir.mkdir(parents=True, exist_ok=True)
    (mdir / "legacy.json").write_text(
        json.dumps({"files": ["data/a.parquet"], "deltas": ["data/d.parquet"]})
    )
    files, deltas = tbl._resolve_manifest("_meta/manifests/legacy.json")
    assert files == ["data/a.parquet"] and deltas == ["data/d.parquet"]
