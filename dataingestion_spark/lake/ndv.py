"""Per-bucket HLL NDV sketches - the cardinality side of the metadata
layer (Iceberg puffin ``apache-datasketches-theta-v1`` blob / Delta
`OPTIMIZE ... computeStats` analog). A 100 TB table answers "how many
distinct conversations / users / tools?" constantly - for join planning,
quality gates ("did yesterday's load double the key space?"), and
capacity math - and a full `COUNT(DISTINCT)` scan per question is
exactly the job you cannot afford at that size.

Design:

* One Apache DataSketches HLL sketch PER BUCKET per tracked column,
  built over the bucket's LIVE rows (MOR chains resolved, tombstones
  out) with Spark's own ``hll_sketch_agg`` - executor-side, Arrow-free,
  one job over only the STALE buckets.
* Freshness is structural: each bucket entry records a fingerprint of
  its (base + delta) file lists; maintenance recomputes a bucket iff its
  files changed (the same two-level-manifest discipline as the bloom
  index). Unchanged buckets are never rescanned.
* The table-level estimate unions the bucket sketches with
  ``hll_union_agg`` - an O(buckets)-row job over ~1 KiB binaries, never
  a data scan. HLL union is lossless, so the sharded estimate equals a
  single-pass sketch of the whole table.
* ONE index has ONE precision (lg_k): mismatched calls fail fast unless
  rebuilt, mirroring the bloom/LSH index contract.

Sharded storage under ``_meta/ndv/``: ``spec.json`` head (lg_k, tracked
columns) + one ``bucket-<b>.json`` per bucket (fingerprint + base64
sketches), written tmp+rename.
"""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import types as T

from dataingestion_spark.lake.shardstore import ShardStore

DEFAULT_LG_K = 12  # datasketches default; ~2.5% relative std error

_DIRECT = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.StringType, T.BinaryType, T.FloatType, T.DoubleType,
)


def sketchable(dtype: T.DataType) -> bool:
    """Types hll_sketch_agg accepts directly, plus timestamp/date (cast
    to their integer epoch forms - injective, so distinct counts are
    preserved exactly)."""
    return isinstance(dtype, _DIRECT + (T.TimestampType, T.DateType))


def sketch_input(col: str, dtype: T.DataType):
    from pyspark.sql import functions as F

    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(dtype, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01").cast("date"))
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        # float distinct-ness keyed on the exact IEEE bits
        return F.col(col).cast("double").cast("string")
    return F.col(col)


def fingerprint(files: list[str]) -> str:
    return hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()


class NdvStore(ShardStore):
    """``_meta/ndv/`` instance of the shared shard-store layout
    (lake/shardstore.py), plus the sketch binary codec."""

    def __init__(self, table_root: Path):
        super().__init__(table_root, "ndv")

    @staticmethod
    def encode(sk: bytes) -> str:
        return base64.b64encode(sk).decode()

    @staticmethod
    def decode(s: str) -> bytes:
        return base64.b64decode(s)
