"""Scan-parallelism guard for CPU-dense per-row operators.

A small corpus often arrives as one parquet file with one row group — one
scan partition — so an operator whose cost is dominated by per-row
compute (shingling + 16 hash mins per doc, per-vector dot products)
serializes on a single core no matter how many the session has
(measured: the full MinHash near-dup pipeline over a 1-file corpus ran
2.5x slower than the same corpus pre-split, with 31 of 32 cores idle).

``fan_out`` repartitions such inputs up to the session's default
parallelism. At production scale this is a NO-OP by construction: a
100 TB table scans as tens of thousands of partitions, already above any
executor count, and the guard never triggers — so the shuffle it
introduces only ever moves a corpus small enough to fit in a handful of
partitions. Do NOT use it in front of scan-bound projections (filters,
fingerprints): there the scan is the bottleneck and a shuffle is pure
overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism when its
    current scan would use fewer partitions; return it unchanged (no
    shuffle inserted) otherwise."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
