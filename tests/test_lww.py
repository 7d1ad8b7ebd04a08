"""LWW dedup unit tests (SURVEY.md §5: LSN ties -> ts tiebreak, strategy
equivalence, duplicate-delivery collapse)."""

import pandas as pd
from pyspark.sql import functions as F

from dataingestion_spark.operators.lww import lww_dedupe
from dataingestion_spark.sources.datagen import gen_changes


def test_lww_picks_max_lsn(spark):
    df = spark.createDataFrame(
        [
            ("INSERT", "c1", 0, "a", 10, "f1"),
            ("UPDATE", "c1", 0, "b", 20, "f1"),
            ("UPDATE", "c1", 0, "stale", 5, "f2"),
            ("INSERT", "c1", 1, "x", 1, "f1"),
        ],
        "op string, conv_id string, turn_idx int, text string, lsn long, source_file string",
    )
    out = lww_dedupe(df, ["conv_id", "turn_idx"], ["lsn"]).toPandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(out["text"]) == ["b", "x"]
    assert list(out["lsn"]) == [20, 1]


def test_lww_ts_tiebreak(spark):
    df = spark.createDataFrame(
        [
            ("c1", 0, "early", 7, 100),
            ("c1", 0, "late", 7, 200),
        ],
        "conv_id string, turn_idx int, text string, lsn long, ts long",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    out = lww_dedupe(df, ["conv_id", "turn_idx"], ["lsn", "ts"]).toPandas()
    assert list(out["text"]) == ["late"]


def test_strategies_agree_on_synthetic_stream(spark):
    df = gen_changes(spark, n_events=5_000, n_convs=40, max_turns=20, seed=7)
    a = (
        lww_dedupe(df, ["conv_id", "turn_idx"], ["lsn", "ts"], strategy="agg")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    w = (
        lww_dedupe(df, ["conv_id", "turn_idx"], ["lsn", "ts"], strategy="window")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, w)


def test_duplicate_deliveries_collapse(spark):
    df = gen_changes(spark, n_events=2_000, n_convs=30, dup_frac=0.3, seed=11)
    out = lww_dedupe(df, ["conv_id", "turn_idx"], ["lsn", "ts"])
    n = out.count()
    distinct_keys = df.select("conv_id", "turn_idx").distinct().count()
    assert n == distinct_keys
