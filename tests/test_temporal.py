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


# ----------------------------------------------------------------------
# parallelism-invariance properties (round-3 verdict item 8): for ANY
# random gaps/ties, sessionize and asof_join equal their pandas oracles
# at BOTH an effectively-serial plan (1 shuffle partition, 1 input
# partition) and a spread one (8/5) - the axis along which partial-agg
# order, and hence any FP reassociation or window nondeterminism, would
# show up. Mirrors the salted==unsalted discipline.
# ----------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PAR = st.sampled_from([(1, 1), (8, 5)])


def _with_parallelism(spark, parts):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return prev


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),        # user
            st.integers(0, 5_000),    # ts seconds (dups likely)
            st.integers(-64_000, 64_000),  # value in 64ths (dyadic: exact
        ),                                 # in double AND in decimal(18,6))
        min_size=1,
        max_size=120,
    ),
    _PAR,
)
def test_sessionize_equals_pandas_for_any_gaps_and_ties(spark, rows, par):
    parts, repart = par
    pdf = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "sec": [r[1] for r in rows],
            "value": [r[2] / 64.0 for r in rows],
        }
    )
    pdf["ts"] = pd.to_datetime(pdf["sec"], unit="s")
    gap_s = 60

    # pandas oracle: order-insensitive within equal ts (equal ts => gap 0
    # => same session), exact dyadic sums
    o = pdf.sort_values(["user_id", "sec"], kind="mergesort").copy()
    brk = (o["user_id"] != o["user_id"].shift()) | (
        o["sec"] - o["sec"].shift() > gap_s
    )
    o["session_seq"] = brk.groupby(o["user_id"]).cumsum().astype("int64")
    want = (
        o.groupby(["user_id", "session_seq"])
        .agg(
            n_events=("value", "size"),
            total_value=("value", "sum"),
        )
        .reset_index()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )

    prev = _with_parallelism(spark, parts)
    try:
        df = spark.createDataFrame(
            pdf[["user_id", "ts", "value"]], "user_id int, ts timestamp, value double"
        ).repartition(repart)
        got = (
            sessionize(df, gap_s=gap_s, agg_value="value")
            .select("user_id", "session_seq", "n_events", "total_value")
            .toPandas()
            .sort_values(["user_id", "session_seq"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert len(got) == len(want)
    assert (got["user_id"].values == want["user_id"].values).all()
    assert (got["session_seq"].values == want["session_seq"].values).all()
    assert (got["n_events"].values == want["n_events"].values).all()
    # EXACT equality: both sides are exact for dyadic 64ths
    assert (got["total_value"].values == want["total_value"].values).all()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 300)),
        min_size=1,
        max_size=60,
    ),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 300)),
        min_size=1,
        max_size=60,
    ),
    _PAR,
)
def test_asof_equals_merge_asof_for_any_ties(spark, lrows, rrows, par):
    parts, repart = par
    left = pd.DataFrame(
        {"k": [r[0] for r in lrows], "ts": [r[1] for r in lrows]}
    )
    left["lv"] = range(len(left))
    right = pd.DataFrame(
        {"k": [r[0] for r in rrows], "ts": [r[1] for r in rrows]}
    )
    right["rv"] = [i * 10 for i in range(len(right))]
    # unique (k, ts) on the right for a deterministic winner (operator
    # docstring contract, same as merge_asof's requirement)
    right = right.drop_duplicates(["k", "ts"], keep="last")

    want = pd.merge_asof(
        left.sort_values(["ts", "lv"], kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lv").reset_index(drop=True)

    prev = _with_parallelism(spark, parts)
    try:
        got = (
            asof_join(
                spark.createDataFrame(left).repartition(repart),
                spark.createDataFrame(right).repartition(repart),
                on=["k"],
                left_ts="ts",
                right_ts="ts",
            )
            .toPandas()
            .sort_values("lv")
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert len(got) == len(want)
    assert (got["lv"].values == want["lv"].values).all()
    got_rv = got["rv_right"].fillna(-1).values
    want_rv = want["rv"].fillna(-1).values
    assert (got_rv == want_rv).all()
