"""Incremental LSH band-index maintenance (lake/sync.py sync_band_index):
the MinHash band relation of a CDC-fed document table kept current by
re-shingling only the changed docs off the changelog. The invariant
everywhere: after every sync the index table equals band_relation() over
the source's live state (that recompute IS the test oracle), across
inserts, text updates (every band hash changes, same keys), deletes,
text-degraded-to-null updates (all band keys retired), multi-epoch
catch-up, and re-sync idempotency."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataingestion_spark.lake.sync import sync_band_index
from dataingestion_spark.lake.table import LakeTable
from dataingestion_spark.operators.dedup import band_relation

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

CHANGE_DDL = "op string, doc_id long, text string, lsn long, source_file string"

SPEC = dict(n=2, num_hashes=8, num_bands=4)


def _make_docs(spark, path):
    return LakeTable.create(
        spark, path, DOC_SCHEMA, pk_fields=["doc_id"],
        order_fields=["lsn"], num_buckets=4,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, CHANGE_DDL)


def _assert_index_matches_recompute(src, idx):
    want = sorted(
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in band_relation(src.read(), "doc_id", "text", **SPEC).collect()
    )
    got = sorted(
        (r["doc_id"], r["band_idx"], r["band_hash"]) for r in idx.read().collect()
    )
    assert got == want


def test_band_index_seed_update_delete_null(spark, tmp_path):
    src = _make_docs(spark, str(tmp_path / "docs"))
    src.merge(
        _batch(
            spark,
            [
                ("INSERT", 1, "the quick brown fox jumps over the dog", 1, "s"),
                ("INSERT", 2, "pack my box with five dozen liquor jugs", 2, "s"),
                ("INSERT", 3, "sphinx of black quartz judge my vow now", 3, "s"),
                ("INSERT", 4, None, 4, "s"),  # null text: no band rows ever
            ],
        ),
        pipeline_id="ing",
        epoch_id=0,
    )
    idx_path = str(tmp_path / "idx")
    snap = sync_band_index(src, idx_path, **SPEC)
    assert snap is not None
    idx = LakeTable(spark, idx_path)
    _assert_index_matches_recompute(src, idx)
    # every indexed doc has exactly num_bands rows; doc 4 has none
    per_doc = {
        r["doc_id"]: r["n"]
        for r in idx.read().groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc == {1: 4, 2: 4, 3: 4}

    # epoch 1: update doc 1's text, delete doc 2, degrade doc 3 to null
    src.merge(
        _batch(
            spark,
            [
                ("UPDATE", 1, "a completely different document body here", 10, "s"),
                ("DELETE", 2, None, 11, "s"),
                ("UPDATE", 3, None, 12, "s"),
            ],
        ),
        pipeline_id="ing",
        epoch_id=1,
    )
    assert sync_band_index(src, idx, **SPEC) is not None
    _assert_index_matches_recompute(src, idx)
    left = {r["doc_id"] for r in idx.read().select("doc_id").distinct().collect()}
    assert left == {1}

    # idempotency: nothing new at the source -> no-op, state unchanged
    assert sync_band_index(src, idx, **SPEC) is None
    _assert_index_matches_recompute(src, idx)


def test_band_index_multi_epoch_catch_up(spark, tmp_path):
    src = _make_docs(spark, str(tmp_path / "docs"))
    idx_path = str(tmp_path / "idx")
    src.merge(
        _batch(spark, [("INSERT", 1, "one two three four five", 1, "s")]),
        pipeline_id="ing", epoch_id=0,
    )
    sync_band_index(src, idx_path, **SPEC)
    idx = LakeTable(spark, idx_path)
    # two source epochs land before the next sync: the diff is NET
    src.merge(
        _batch(spark, [("INSERT", 2, "six seven eight nine ten", 2, "s")]),
        pipeline_id="ing", epoch_id=1,
    )
    src.merge(
        _batch(
            spark,
            [
                ("UPDATE", 2, "six seven eight nine ten eleven", 3, "s"),
                ("DELETE", 1, None, 4, "s"),
            ],
        ),
        pipeline_id="ing", epoch_id=2,
    )
    assert sync_band_index(src, idx, **SPEC) is not None
    _assert_index_matches_recompute(src, idx)


def test_band_index_spec_guard(spark, tmp_path):
    src = _make_docs(spark, str(tmp_path / "docs"))
    src.merge(
        _batch(spark, [("INSERT", 1, "alpha beta gamma delta", 1, "s")]),
        pipeline_id="ing", epoch_id=0,
    )
    # a table that is NOT a band index (wrong pk) is refused
    other = LakeTable.create(
        spark, str(tmp_path / "other"), DOC_SCHEMA, pk_fields=["doc_id"],
        order_fields=["lsn"], num_buckets=2,
    )
    with pytest.raises(ValueError, match="not the band index"):
        sync_band_index(src, other, **SPEC)


def test_band_index_serves_candidate_join(spark, tmp_path):
    """The maintained index IS the candidate-join relation: near-dup
    candidates from the index equal lsh_candidates recomputed from
    scratch."""
    from dataingestion_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
        shingled,
    )

    src = _make_docs(spark, str(tmp_path / "docs"))
    rows = [
        ("INSERT", 1, "the quick brown fox jumps over the lazy dog", 1, "s"),
        ("INSERT", 2, "the quick brown fox jumps over the lazy cat", 2, "s"),
        ("INSERT", 3, "an entirely unrelated document about spark", 3, "s"),
    ]
    src.merge(_batch(spark, rows), pipeline_id="ing", epoch_id=0)
    idx_path = str(tmp_path / "idx")
    sync_band_index(src, idx_path, **SPEC)
    idx = LakeTable(spark, idx_path).read()

    a, b = idx.alias("a"), idx.alias("b")
    from_index = sorted(
        (r["id_a"], r["id_b"])
        for r in a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
        .collect()
    )
    sigs = minhash_signatures(
        shingled(src.read(), "doc_id", "text", SPEC["n"]), "doc_id",
        SPEC["num_hashes"],
    )
    scratch = sorted(
        (r["id_a"], r["id_b"])
        for r in lsh_candidates(sigs, "doc_id", SPEC["num_bands"]).collect()
    )
    assert from_index == scratch and len(from_index) > 0
