"""File-level bloom index (lake/bloom.py + LakeTable.update_bloom_index /
read_keys use_bloom): the Hudi bloom-index / metadata-table analog. The
contract under test: lookups THROUGH the index equal lookups WITHOUT it
on every table shape (COW, MOR deltas, stale index, post-compaction),
absent keys skip every indexed file, and the index maintains itself
incrementally and idempotently under one pinned spec."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.lake import bloom as B
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA


def _mk(spark, path, buckets=4):
    return LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=buckets,
    )


def _lookup(tbl, keys, **kw):
    return sorted(
        map(tuple, tbl.read_keys(keys, **kw).select("conv_id", "turn_idx").collect())
    )


# ---------------------------------------------------------------------------
# pure bitmap properties
# ---------------------------------------------------------------------------


def test_bitmap_no_false_negatives_and_low_fpp():
    frame = pd.DataFrame({
        "conv_id": [f"conv_{i:06d}" for i in range(5000)],
        "turn_idx": np.arange(5000) % 37,
    })
    entry = B.build_bitmap(frame)
    present = [(f"conv_{i:06d}", i % 37) for i in range(0, 5000, 13)]
    h1, h2 = B.key_hashes(present)
    for i in range(len(present)):  # every present key must be found
        assert B.any_key_maybe_present(entry, h1[i : i + 1], h2[i : i + 1])
    absent = [(f"xx_{i}", 999) for i in range(2000)]
    a1, a2 = B.key_hashes(absent)
    fp = sum(
        B.any_key_maybe_present(entry, a1[i : i + 1], a2[i : i + 1])
        for i in range(len(absent))
    )
    assert fp / len(absent) < 0.05  # ~0.1% expected at 10+ bits/key
    # empty file rejects everything
    assert not B.any_key_maybe_present(B.build_bitmap(frame.iloc[0:0]), h1, h2)


def test_key_rendering_null_and_type_canonical():
    # builder-side numpy ints and reader-side python ints must hash equal;
    # null pk components get the sentinel on both sides
    frame = pd.DataFrame({"a": ["x", None], "b": np.array([5, 7], dtype=np.int32)})
    entry = B.build_bitmap(frame)
    h1, h2 = B.key_hashes([("x", 5)])
    assert B.any_key_maybe_present(entry, h1, h2)
    n1, n2 = B.key_hashes([(None, 7)])
    assert B.any_key_maybe_present(entry, n1, n2)


# ---------------------------------------------------------------------------
# table integration
# ---------------------------------------------------------------------------


def test_bloom_lookup_equality_and_absent_key_skip(spark, tmp_path):
    tbl = _mk(spark, tmp_path / "t")
    changes = gen_changes(spark, n_events=8_000, n_convs=60, seed=31)
    tbl.merge(changes, pipeline_id="p", epoch_id=0)
    r = tbl.update_bloom_index()
    assert r["applied"] and r["indexed"] == r["covered_files"] > 0
    # idempotent second call
    r2 = tbl.update_bloom_index()
    assert not r2["applied"] and r2["indexed"] == 0

    live = tbl.read().select("conv_id", "turn_idx").limit(20).collect()
    keys = [tuple(x) for x in live] + [("conv_nothere", 1), ("zzz", 0)]
    assert _lookup(tbl, keys) == _lookup(tbl, keys, use_bloom=False)
    assert len(_lookup(tbl, keys)) == len(live)

    # an absent key must skip EVERY indexed base file and return empty
    snap = tbl.snapshot()
    fmap, dmap, skipped = tbl._bloom_prune(
        snap, list(range(snap.num_buckets)), [("conv_nothere", 1)]
    )
    assert skipped == sum(len(v) for v in snap.files.values())
    assert not any(fmap.values())
    assert tbl.read_keys([("conv_nothere", 1)]).count() == 0


def test_bloom_mor_deltas_indexed_and_equal(spark, tmp_path):
    tbl = _mk(spark, tmp_path / "t")
    changes = gen_changes(spark, n_events=6_000, n_convs=50, seed=32, dup_frac=0.1)
    changes.persist()
    lsns = sorted(r[0] for r in changes.select("lsn").distinct().collect())
    cut = lsns[len(lsns) // 2]
    tbl.merge(changes.filter(F.col("lsn") <= cut), pipeline_id="p", epoch_id=0)
    tbl.merge(
        changes.filter(F.col("lsn") > cut), pipeline_id="p", epoch_id=1,
        write_mode="mor",
    )
    snap = tbl.snapshot()
    assert any(snap.deltas.values()), "test needs unresolved delta files"
    r = tbl.update_bloom_index()
    n_files = sum(len(v) for v in snap.files.values()) + sum(
        len(v) for v in snap.deltas.values()
    )
    assert r["covered_files"] == n_files  # deltas indexed too

    live = tbl.read().select("conv_id", "turn_idx").limit(25).collect()
    keys = [tuple(x) for x in live] + [("conv_nothere", 3)]
    assert _lookup(tbl, keys) == _lookup(tbl, keys, use_bloom=False)
    changes.unpersist()


def test_bloom_stale_index_never_wrong_then_catches_up(spark, tmp_path):
    """New files written AFTER the index update have no entries - they
    must be kept (lookups exact on a stale index); the next update
    indexes them and drops dead entries after compaction."""
    tbl = _mk(spark, tmp_path / "t")
    a = gen_changes(spark, n_events=4_000, n_convs=40, seed=33)
    tbl.merge(a, pipeline_id="p", epoch_id=0)
    tbl.update_bloom_index()
    b = gen_changes(spark, n_events=4_000, n_convs=40, seed=34)
    tbl.merge(b, pipeline_id="p", epoch_id=1)  # index now stale

    live = tbl.read().select("conv_id", "turn_idx").limit(30).collect()
    keys = [tuple(x) for x in live]
    assert _lookup(tbl, keys) == _lookup(tbl, keys, use_bloom=False)

    r = tbl.update_bloom_index()
    assert r["applied"] and r["indexed"] > 0 and r["dropped"] > 0
    assert _lookup(tbl, keys) == _lookup(tbl, keys, use_bloom=False)

    tbl.compact()
    r2 = tbl.update_bloom_index()  # rewritten buckets: new files in, dead out
    assert r2["applied"] and r2["dropped"] > 0
    assert _lookup(tbl, keys) == _lookup(tbl, keys, use_bloom=False)


def test_bloom_spec_guard_and_rebuild(spark, tmp_path):
    tbl = _mk(spark, tmp_path / "t")
    tbl.merge(gen_changes(spark, n_events=2_000, n_convs=20, seed=35),
              pipeline_id="p", epoch_id=0)
    tbl.update_bloom_index(bits_per_key=10, k=7)
    with pytest.raises(ValueError, match="one index, one hash family"):
        tbl.update_bloom_index(bits_per_key=16, k=7)
    r = tbl.update_bloom_index(bits_per_key=16, k=5, rebuild=True)
    assert r["applied"]
    spec = B.BloomIndexStore(tbl.root).spec()
    assert spec["bits_per_key"] == 16 and spec["k"] == 5
    live = tbl.read().select("conv_id", "turn_idx").limit(10).collect()
    keys = [tuple(x) for x in live] + [("nope", 0)]
    assert _lookup(tbl, keys) == _lookup(tbl, keys, use_bloom=False)


def test_bloom_every_live_key_individually_found(spark, tmp_path):
    """No-false-negative property at the table level: EVERY live pk,
    looked up alone through the index, returns exactly its row."""
    tbl = _mk(spark, tmp_path / "t")
    tbl.merge(gen_changes(spark, n_events=3_000, n_convs=25, seed=36),
              pipeline_id="p", epoch_id=0)
    tbl.update_bloom_index()
    live = tbl.read().select("conv_id", "turn_idx").collect()
    sample = [tuple(x) for x in live][::17]
    for key in sample:
        assert _lookup(tbl, [key]) == [key]


def test_bloom_non_indexable_pk_fails_fast(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("ts_key", T.TimestampType()),
        T.StructField("v", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    tbl = LakeTable.create(
        spark, tmp_path / "t", schema, pk_fields=["ts_key"],
        order_fields=["lsn", "ts"], num_buckets=2,
    )
    with pytest.raises(ValueError, match="non-indexable"):
        tbl.update_bloom_index()
