"""Window-ranked last-writer-wins deduplication - the core CDC semantic.

Reference parity: Hudi's precombine step - among records with the same
record key keep the one with max(precombine field)
(/root/reference/spark/src/main/scala/com/example/core/SparkUtils.scala:134,140)
- generalized to a composite ordering (lsn, ts, source_file) over a
composite key (conv_id, turn_idx).

Two physical strategies, identical results (proven by test):

  * ``agg`` (default): ``groupBy(pk).agg(max_by(struct(payload), struct(order)))``.
    Catalyst plans this as hash aggregation WITH partial (map-side) combine,
    so at 10^10-event replay scale the shuffle carries at most one row per
    (key, map-partition) - duplicate-heavy and hot keys collapse before the
    exchange. This is strictly better than a window at scale.
  * ``window``: ``row_number() over (partition by pk order by order desc) = 1``
    - the literal "window-ranked LWW" form; shuffles every row, kept for
    parity testing and for callers that need the rank itself.

Ordering note: ties on (lsn, ts) only occur for exact re-deliveries (same
payload), so the final tiebreak on source_file merely makes the plan
deterministic - it never changes visible data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedupe(
    df: DataFrame,
    pk_fields: list[str],
    order_fields: list[str],
    tiebreak_fields: list[str] | None = None,
    strategy: str = "agg",
) -> DataFrame:
    """Keep exactly one row per primary key: the last writer in
    (order_fields, tiebreak_fields) order. Column set is preserved."""
    if tiebreak_fields is None:
        tiebreak_fields = [c for c in ("source_file",) if c in df.columns]
    order_cols = [c for c in order_fields + tiebreak_fields if c in df.columns]
    payload_cols = [c for c in df.columns if c not in pk_fields]

    if strategy == "agg":
        winner = F.max_by(
            F.struct(*[F.col(c) for c in payload_cols]),
            F.struct(*[F.col(c) for c in order_cols]),
        ).alias("_w")
        out = df.groupBy(*pk_fields).agg(winner)
        return out.select(
            *[
                F.col(c) if c in pk_fields else F.col(f"_w.{c}").alias(c)
                for c in df.columns
            ]
        )
    if strategy == "window":
        w = Window.partitionBy(*pk_fields).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
        return (
            df.withColumn("_lww_rn", F.row_number().over(w))
            .filter(F.col("_lww_rn") == 1)
            .drop("_lww_rn")
        )
    raise ValueError(f"unknown LWW strategy: {strategy!r}")
