"""Per-bucket HLL NDV sketches (lake/ndv.py + LakeTable.update_ndv_sketch
/ approx_ndv - Iceberg puffin / Delta computeStats analog): distinct
counts from metadata, maintenance priced by churn, union lossless."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA


def _table(spark, tmp_path):
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=8,
    )
    return tbl, gen_changes(
        spark, n_events=6_000, n_convs=120, seed=9
    ).persist()


def test_ndv_accuracy_and_incremental_maintenance(spark, tmp_path):
    tbl, ch = _table(spark, tmp_path)
    tbl.merge(ch.filter(F.col("lsn") < 8_000), pipeline_id="p", epoch_id=0)

    out = tbl.update_ndv_sketch(["conv_id", "role"])
    assert out["applied"] and out["buckets_refreshed"] == 8
    # idempotent on the same snapshot: zero refresh, zero jobs
    again = tbl.update_ndv_sketch(["conv_id", "role"])
    assert again == {"applied": False, "buckets_refreshed": 0}

    exact = tbl.read().select("conv_id").distinct().count()
    est = tbl.approx_ndv("conv_id")
    assert abs(est - exact) <= max(2, 0.05 * exact), (est, exact)
    # low-cardinality columns are near-exact
    assert tbl.approx_ndv("role") == tbl.read().select("role").distinct().count()

    # a merge touching a SUBSET of buckets only refreshes those
    late = ch.filter(F.col("lsn") >= 8_000)
    conv = late.select("conv_id").first().conv_id
    tbl.merge(
        late.filter(F.col("conv_id") == conv), pipeline_id="p", epoch_id=1
    )
    from dataingestion_spark.lake.ndv import NdvStore

    touched = tbl.update_ndv_sketch(["conv_id", "role"])
    assert touched["applied"]
    assert 0 < touched["buckets_refreshed"] < 8
    exact2 = tbl.read().select("conv_id").distinct().count()
    assert abs(tbl.approx_ndv("conv_id") - exact2) <= max(2, 0.05 * exact2)
    assert NdvStore(tbl.root).spec()["cols"] == ["conv_id", "role"]
    ch.unpersist()


def test_ndv_reflects_deletes_and_timestamps(spark, tmp_path):
    tbl, ch = _table(spark, tmp_path)
    tbl.merge(ch, pipeline_id="p", epoch_id=0)
    ch.unpersist()
    assert tbl.approx_ndv("ts") > 0  # timestamp cast path

    victims = [
        r.conv_id
        for r in tbl.read().select("conv_id").distinct().limit(30).collect()
    ]
    tbl.delete_where(F.col("conv_id").isin(victims))
    exact = tbl.read().select("conv_id").distinct().count()
    est = tbl.approx_ndv("conv_id")  # refresh picks up the DML rewrite
    assert abs(est - exact) <= max(2, 0.05 * exact), (est, exact)


def test_ndv_spec_guard_and_validation(spark, tmp_path):
    tbl, ch = _table(spark, tmp_path)
    tbl.merge(ch.limit(500), pipeline_id="p", epoch_id=0)
    ch.unpersist()
    tbl.update_ndv_sketch(["conv_id"], lg_k=12)
    with pytest.raises(ValueError, match="one index, one precision"):
        tbl.update_ndv_sketch(["conv_id"], lg_k=14)
    out = tbl.update_ndv_sketch(["conv_id"], lg_k=14, rebuild=True)
    assert out["applied"]
    with pytest.raises(ValueError, match="not in schema"):
        tbl.update_ndv_sketch(["nope"])
    # stale read serves stored sketches without a refresh job
    assert tbl.approx_ndv("conv_id", refresh=False) > 0
