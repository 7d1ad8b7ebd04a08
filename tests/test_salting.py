"""Skew-salting tests: salting invariance (salted result == unsalted
result) and hot-key detection (SURVEY.md §5)."""

import pandas as pd
from pyspark.sql import functions as F

from dataingestion_spark import oracle
from dataingestion_spark.lake import LakeTable
from dataingestion_spark.operators.salting import detect_hot_keys, with_salt
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA, assert_table_equals_oracle


def test_detect_hot_keys_finds_zipf_head(spark):
    # zipf_exp=3 concentrates events heavily on conv_000000
    df = gen_changes(spark, n_events=5_000, n_convs=200, zipf_exp=3.0, seed=21)
    hot = detect_hot_keys(df, threshold=0.05)
    assert "conv_000000" in hot
    assert len(hot) <= 20  # bounded by 1/threshold


def test_salt_is_stable_per_key(spark):
    df = gen_changes(spark, n_events=2_000, n_convs=10, zipf_exp=3.0, seed=22)
    hot = detect_hot_keys(df, threshold=0.05)
    salted = with_salt(df, hot, k=8)
    # same (conv_id, turn_idx) always gets the same salt
    n_violations = (
        salted.groupBy("conv_id", "turn_idx")
        .agg(F.countDistinct("_salt").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert n_violations == 0
    # hot key actually spreads across >1 salt bucket
    spread = (
        salted.filter(F.col("conv_id") == hot[0])
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread > 1


def test_salted_merge_equals_unsalted(spark, tmp_path):
    """End-to-end salting invariance: a heavily skewed stream merged with
    aggressive salting produces exactly the oracle state (and therefore
    exactly the unsalted result)."""
    changes = gen_changes(
        spark, n_events=6_000, n_convs=500, max_turns=200, zipf_exp=4.0, seed=23
    )
    salted_tbl = LakeTable.create(
        spark, tmp_path / "salted", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"], num_buckets=4,
    )
    salted_tbl.merge(
        changes, pipeline_id="t", epoch_id=0, hot_key_threshold=0.01, salt_buckets=8
    )
    snap = salted_tbl.snapshot()
    assert snap.summary["hot_keys"], "skewed stream should trigger salting"
    expected = oracle.replay(changes.toPandas())
    assert_table_equals_oracle(salted_tbl.read(), expected)
