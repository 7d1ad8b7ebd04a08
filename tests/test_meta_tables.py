"""Metadata tables (LakeTable.meta - Iceberg table$files / $snapshots /
$partitions / $manifests analog): the table's own bookkeeping as
queryable DataFrames. Ops questions become ordinary Spark queries; cost
is driver-side over the manifests + parquet footers, never a data
scan."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA


def _table(spark, tmp_path):
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=4,
    )
    ch = gen_changes(spark, n_events=3_000, n_convs=40, seed=11)
    tbl.merge(ch.filter(F.col("lsn") < 3_000), pipeline_id="p", epoch_id=0)
    tbl.merge(
        ch.filter(F.col("lsn") >= 3_000), pipeline_id="p", epoch_id=1,
        write_mode="mor",
    )
    return tbl


def test_meta_snapshots_files_partitions_manifests(spark, tmp_path):
    tbl = _table(spark, tmp_path)
    tbl.tag("rel-1")
    tbl.compact()
    snap = tbl.snapshot()

    snaps = tbl.meta("snapshots").collect()
    assert len(snaps) == len(tbl.retained_versions())
    assert [r.version for r in snaps] == tbl.retained_versions()
    ops = {r.version: r.operation for r in snaps}
    assert ops[1] == "create" and ops[snap.version] == "compact"
    tagged = {r.version: r.tags for r in snaps}
    assert tagged[tbl.resolve_tag("rel-1")] == ["rel-1"]
    assert all(r.committed_at is not None for r in snaps)

    files = tbl.meta("files").collect()
    assert all((tbl.root / r.path).is_file() for r in files)
    assert {r.kind for r in files} == {"base"}  # compaction folded deltas
    # physical rows = live rows + tombstones; never fewer than a read
    assert sum(r.row_count for r in files) >= tbl.read().count()
    # pre-compaction snapshot still exposes its MOR delta files
    pre = tbl.meta("files", version=snap.version - 1).collect()
    assert {r.kind for r in pre} == {"base", "delta"}

    parts = tbl.meta("partitions").collect()
    d = tbl.describe()
    assert sum(r.data_files for r in parts) == d["data_files"]
    assert sum(r.delta_files for r in parts) == d["delta_files"]
    assert sum(r.row_count for r in parts) == sum(r.row_count for r in files)

    manifests = tbl.meta("manifests").collect()
    assert {r.bucket for r in manifests} == {int(b) for b in snap.manifest_refs}
    assert all(r.manifest for r in manifests)

    tbl.update_bloom_index()
    tbl.update_ndv_sketch(["conv_id"])
    tbl.update_secondary_index("tool")
    idx = {r.name: r for r in tbl.meta("indexes").collect()}
    assert set(idx) == {"bloom", "ndv", "secondary:tool"}
    assert idx["bloom"].kind == "pk-bloom" and idx["bloom"].buckets > 0
    assert "lg_k" in idx["ndv"].spec

    with pytest.raises(ValueError, match="unknown metadata table"):
        tbl.meta("wat")


def test_meta_is_queryable_spark(spark, tmp_path):
    """The point of DataFrame metadata: join/aggregate with plain Spark -
    e.g. 'bytes added per commit' from snapshots x files."""
    tbl = _table(spark, tmp_path)
    biggest = (
        tbl.meta("files")
        .groupBy("bucket")
        .agg(F.sum("size_bytes").alias("bytes"))
        .orderBy(F.desc("bytes"))
        .first()
    )
    assert biggest.bytes > 0
