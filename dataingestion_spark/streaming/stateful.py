"""Custom stateful streaming operator: per-conversation progress tracking
via ``applyInPandasWithState``.

The reference has no stateful streaming op (SURVEY.md §2.8 - no watermark,
no mapGroupsWithState anywhere); this is the engine's demonstration of the
capability the brief calls for ("applyInPandasWithState for custom stateful
operators"): a per-key running aggregate over the change stream that a
downstream monitor can read as "how far has each conversation ingested".

State per conv_id: (n_events, max_lsn, max_turn_idx, last_ts). Each
micro-batch folds its rows into the state (Arrow-batched pandas, never
per-row Python over the wire) and emits the updated row. GroupStateTimeout
is disabled - conversations are long-lived; at 10^10 scale state is
bounded by #conversations x ~48 bytes and sharded across executors by the
groupBy hash.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = "n_events LONG, max_lsn LONG, max_turn_idx INT, last_ts_us LONG"


def _fold(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n_events, max_lsn, max_turn, last_ts_us = (
        state.get if state.exists else (0, -1, -1, 0)
    )
    for pdf in pdfs:
        n_events += len(pdf)
        if len(pdf):
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            ts_us = pdf["ts"].astype("int64").max() // 1000
            last_ts_us = max(last_ts_us, int(ts_us))
    state.update((n_events, max_lsn, max_turn, last_ts_us))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_events": [n_events],
            "max_lsn": [max_lsn],
            "max_turn_idx": [max_turn],
            "last_ts": [pd.Timestamp(last_ts_us * 1000, unit="ns")],
        }
    )


def conversation_progress(stream: DataFrame) -> DataFrame:
    """Stateful per-conversation progress over a streaming change
    DataFrame; emits one updated row per conversation per micro-batch.
    Output mode must be ``update``."""
    return (
        stream.select("conv_id", "turn_idx", "lsn", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _fold,
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
