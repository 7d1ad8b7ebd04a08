"""Conversation assembly (operators/assembly.py): turn rows -> one
training sample per conversation. Hand-built + pandas oracles; the
driver additionally cross-checks against DuckDB string_agg at sf0.01
(transcript_assembly)."""

import datetime as dt

from pyspark.sql import functions as F

from dataingestion_spark.operators.assembly import assemble_conversations

UTC = dt.timezone.utc


def _df(spark):
    rows = [
        # conv a: out-of-order arrival, tool call, null text
        ("a", 2, "assistant", "fine", "search", dt.datetime(2024, 1, 1, 0, 2)),
        ("a", 0, "user", "hi", None, dt.datetime(2024, 1, 1, 0, 0)),
        ("a", 1, "assistant", None, None, dt.datetime(2024, 1, 1, 0, 1)),
        # conv b: single turn, null role
        ("b", 0, None, "solo", None, dt.datetime(2024, 2, 1)),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp",
    )


def test_assembles_ordered_samples_and_stats(spark):
    got = {
        r["conv_id"]: r
        for r in assemble_conversations(_df(spark)).collect()
    }
    a = got["a"]
    assert a["n_turns"] == 3
    assert a["n_user"] == 1 and a["n_assistant"] == 2
    assert a["n_tool_calls"] == 1
    assert a["total_chars"] == len("hi") + len("fine")
    assert a["first_ts"] == dt.datetime(2024, 1, 1, 0, 0)
    assert a["last_ts"] == dt.datetime(2024, 1, 1, 0, 2)
    # turn order restored despite arrival order; nulls render as ''
    assert a["sample"] == "user: hi\nassistant: \nassistant: fine"
    b = got["b"]
    assert b["n_turns"] == 1 and b["n_user"] == 0
    assert b["sample"] == ": solo"


def test_assembly_matches_pandas_oracle(spark):
    from dataingestion_spark.sources.datagen import gen_changes
    from dataingestion_spark.oracle import replay

    state = replay(
        gen_changes(spark, n_events=3000, n_convs=25, seed=3).toPandas()
    )
    got = (
        assemble_conversations(
            spark.createDataFrame(
                state[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
            )
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    o = state.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    want = o.groupby("conv_id").apply(
        lambda g: "\n".join(
            (g["role"].fillna("") + ": " + g["text"].fillna("")).tolist()
        ),
        include_groups=False,
    )
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert r["sample"] == want[r["conv_id"]], r["conv_id"]
    counts = o.groupby("conv_id").size()
    assert (got.set_index("conv_id")["n_turns"] == counts).all()
