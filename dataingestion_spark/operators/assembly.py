"""Conversation assembly: turn-level transcript rows -> one training
sample per conversation.

The last mile of a transcript pipeline (reference scope ends at the lake;
its consumers do this by hand): after CDC replay materializes the current
per-turn state, training wants ONE row per conversation - the ordered
turns rendered into a prompt string plus the structural stats that drive
sampling/filtering decisions (turn counts, role mix, tool-call rate,
span). Implemented as a single groupBy(conv_id) with collect_list +
array_sort + higher-order rendering - all JVM-side Column expressions,
no Python in the row path.

Scale shape at 100 TB: exactly ONE shuffle, keyed by conv_id (assembly
inherently co-locates a conversation). Per-group state is bounded by the
longest conversation (turns x text size), not the corpus; Zipf-hot
conversations are bounded by the app's max turn count, so there is no
unbounded-skew failure mode, and the output is one row per conversation
- typically 100-1000x smaller than the input. Rendering happens AFTER
the aggregate, on the collapsed rows.

Determinism: turns sort by (turn_idx, ...) inside array_sort; turn_idx
is unique within a conversation post-replay, so the rendered sample is
a total order any engine reproduces (the DuckDB oracle uses
string_agg(... ORDER BY turn_idx)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
    sep: str = "\n",
) -> DataFrame:
    """One row per conversation: (conv_id, n_turns, n_user, n_assistant,
    n_tool_calls, total_chars, first_ts, last_ts, sample) where sample is
    the turn-ordered rendering ``role: text`` joined by ``sep``.

    Null-hygiene: role/text render as '' (never a null element, so the
    join needs no null-skipping semantics - those differ across engines);
    total_chars counts text characters only.
    """
    turn = F.struct(
        F.col(turn_col).alias("t"),
        F.coalesce(F.col(role_col), F.lit("")).alias("r"),
        F.coalesce(F.col(text_col), F.lit("")).alias("x"),
    )
    agg = df.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col(role_col) == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col(role_col) == "assistant", 1).otherwise(0)).alias(
            "n_assistant"
        ),
        F.sum(F.when(F.col(tool_col).isNotNull(), 1).otherwise(0)).alias(
            "n_tool_calls"
        ),
        F.sum(F.coalesce(F.length(text_col), F.lit(0)))
        .cast("long")
        .alias("total_chars"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        F.array_sort(F.collect_list(turn)).alias("_turns"),
    )
    rendered = F.array_join(
        F.transform(
            F.col("_turns"), lambda t: F.concat(t["r"], F.lit(": "), t["x"])
        ),
        sep,
    )
    return agg.withColumn("sample", rendered).drop("_turns")
