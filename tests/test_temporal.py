"""As-of join + gap sessionization (operators/temporal.py). Independent
oracles: pandas merge_asof for the join, hand-built expectations for the
session boundaries; the driver additionally cross-checks both against
DuckDB (ASOF LEFT JOIN / window SQL) at sf0.01."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from dataingestion_spark.operators.temporal import asof_join, sessionize

UTC = dt.timezone.utc


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s, tzinfo=UTC)


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200),
            "ts": rng.randint(0, 10_000, 200),
            "lv": np.arange(200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 300),
            "ts": rng.randint(0, 10_000, 300),
            "rv": np.arange(300) * 10,
        }
    )
    # merge_asof needs unique (k, ts) on the right for a deterministic
    # winner; drop dup timestamps the same way the operator docstring asks
    right = right.drop_duplicates(["k", "ts"], keep="last")
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            left_ts="ts",
            right_ts="ts",
        )
        .toPandas()
        .sort_values(["lv"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lv").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["rv_right"].astype("float64"),
        want["rv"].astype("float64"),
        check_names=False,
    )


def test_asof_edges_inclusive_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (2, 3, "c")], "k int, ts int, tag string"
    )
    right = spark.createDataFrame(
        [(1, 7, "r7"), (1, 10, "r10"), (3, 1, "rx")], "k int, ts int, v string"
    )
    got = (
        asof_join(left, right, on=["k"])
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    # ts=5: no right <= 5 -> null; ts=10: INCLUSIVE match r10; k=2: no rows
    assert got.loc[0, "v_right"] is None or pd.isna(got.loc[0, "v_right"])
    assert got.loc[1, "v_right"] == "r10"
    assert pd.isna(got.loc[2, "v_right"])


def test_asof_plan_is_single_exchange_no_join(spark):
    left = spark.createDataFrame([(1, 5, "a")], "k int, ts int, tag string")
    right = spark.createDataFrame([(1, 3, "r")], "k int, ts int, v string")
    plan = (
        asof_join(left, right, on=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, "asof must not plan a join node"
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_boundaries(spark):
    rows = [
        # user 1: events at 0, 10, 40 min (gap 30 breaks at 40), 41
        (1, _ts(0), 1.0),
        (1, _ts(10), 2.0),
        (1, _ts(40, 1), 4.0),
        (1, _ts(41), 8.0),
        # user 2: single event
        (2, _ts(5), 16.0),
        # user 3: gap EXACTLY the threshold stays one session
        (3, _ts(0), 1.0),
        (3, _ts(30), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    got = (
        sessionize(df, gap_s=1800, agg_value="value")
        .toPandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    assert list(got["n_events"]) == [2, 2, 1, 2]
    assert list(got["session_seq"]) == [1, 2, 1, 1]
    assert list(got["total_value"]) == [3.0, 12.0, 16.0, 2.0]
    u1s2 = got[(got.user_id == 1) & (got.session_seq == 2)].iloc[0]
    assert u1s2["session_start"].minute == 40
