"""Pure-Python replay oracle: the golden final-state for a CDC stream.

Direct descendant of the reference demo's replay oracle
(/root/reference/demo/test_pipeline.sh:225-286, embedded test_upsert.py):
replay events in log order into a per-key dict; the dict at end-of-stream is
the expected lake-table state. Two deliberate deviations, both documented in
SURVEY.md §2.5 / §7.3:

  * UPDATE is a FULL-ROW replace (Hudi/Iceberg MERGE semantics - the
    reference's production path), not the demo's partial dict-merge; the
    generator always emits full payloads so both agree.
  * UPDATE of an absent key inserts it (MERGE `WHEN NOT MATCHED THEN
    INSERT`, Hudi upsert behavior); DELETE of an absent key is a no-op.

Events are replayed ordered by (lsn, ts, source_file) - the engine's LWW
order - so re-deliveries (same lsn, same payload) are harmless.
"""

from __future__ import annotations

import pandas as pd


PAYLOAD_COLUMNS = ["role", "text", "tool", "ts"]


def replay(changes: pd.DataFrame, extra_payload_cols: list[str] | None = None) -> pd.DataFrame:
    """Replay a change log into the expected final table state.

    `changes` needs columns: op, conv_id, turn_idx, lsn, ts + payload.
    Returns a DataFrame with (conv_id, turn_idx, *payload, lsn) sorted by
    (conv_id, turn_idx) - the stable ordering the equality check uses.
    """
    payload_cols = PAYLOAD_COLUMNS + (extra_payload_cols or [])
    sort_cols = ["lsn", "ts"]
    if "source_file" in changes.columns:
        sort_cols.append("source_file")
    ordered = changes.sort_values(sort_cols, kind="mergesort")

    state: dict[tuple, dict] = {}
    for row in ordered.itertuples(index=False):
        d = row._asdict()
        key = (d["conv_id"], d["turn_idx"])
        if d["op"] == "DELETE":
            state.pop(key, None)
        else:  # INSERT and UPDATE both upsert the full row
            state[key] = {c: d.get(c) for c in payload_cols} | {"lsn": d["lsn"]}

    rows = [
        {"conv_id": k[0], "turn_idx": k[1], **v} for k, v in state.items()
    ]
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", *payload_cols, "lsn"]
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def replay_partial(
    changes: pd.DataFrame, extra_payload_cols: list[str] | None = None
) -> pd.DataFrame:
    """Replay with the reference demo oracle's EXACT dict-merge semantics
    (/root/reference/demo/test_pipeline.sh:244-262): INSERT replaces the
    key's dict, UPDATE merges its non-null fields ONLY IF the key exists
    (`if primary_key in user_state: user_state[pk].update(data)` - an
    update on a missing key is dropped), DELETE removes the key. This is
    the golden state for LakeTable.merge(update_mode="partial"). NULL
    payload fields on an UPDATE mean "not set" - the row-relational
    encoding of an absent dict key."""
    payload_cols = PAYLOAD_COLUMNS + (extra_payload_cols or [])
    sort_cols = ["lsn", "ts"]
    if "source_file" in changes.columns:
        sort_cols.append("source_file")
    ordered = changes.sort_values(sort_cols, kind="mergesort")

    state: dict[tuple, dict] = {}
    for row in ordered.itertuples(index=False):
        d = row._asdict()
        key = (d["conv_id"], d["turn_idx"])
        if d["op"] == "DELETE":
            state.pop(key, None)
        elif d["op"] == "INSERT":
            state[key] = {c: d.get(c) for c in payload_cols} | {"lsn": d["lsn"]}
        elif d["op"] == "UPDATE":
            if key in state:
                data = {
                    c: d.get(c)
                    for c in payload_cols
                    if not pd.isna(d.get(c))
                }
                state[key].update(data)
                state[key]["lsn"] = max(state[key]["lsn"], d["lsn"])

    rows = [
        {"conv_id": k[0], "turn_idx": k[1], **v} for k, v in state.items()
    ]
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", *payload_cols, "lsn"]
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
