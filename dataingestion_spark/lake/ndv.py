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
import json
import os
from pathlib import Path

from pyspark.sql import types as T

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


class NdvStore:
    """Sharded sketch storage under ``<table>/_meta/ndv/``."""

    def __init__(self, table_root: Path):
        self.dir = Path(table_root) / "_meta" / "ndv"

    @property
    def spec_path(self) -> Path:
        return self.dir / "spec.json"

    def spec(self) -> dict | None:
        p = self.spec_path
        return json.loads(p.read_text()) if p.is_file() else None

    def write_spec(self, spec: dict) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        self._atomic(self.spec_path, json.dumps(spec, sort_keys=True))

    def bucket_path(self, bucket: int | str) -> Path:
        return self.dir / f"bucket-{int(bucket)}.json"

    def load_bucket(self, bucket: int | str) -> dict:
        p = self.bucket_path(bucket)
        return json.loads(p.read_text()) if p.is_file() else {}

    def write_bucket(self, bucket: int | str, entry: dict) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        self._atomic(self.bucket_path(bucket), json.dumps(entry))

    def drop_bucket(self, bucket: int | str) -> None:
        p = self.bucket_path(bucket)
        if p.is_file():
            p.unlink()

    def buckets(self) -> list[int]:
        return sorted(
            int(p.stem.split("-", 1)[1]) for p in self.dir.glob("bucket-*.json")
        )

    @staticmethod
    def _atomic(path: Path, text: str) -> None:
        tmp = path.with_suffix(".tmp")
        tmp.write_text(text)
        os.replace(tmp, path)

    @staticmethod
    def encode(sk: bytes) -> str:
        return base64.b64encode(sk).decode()

    @staticmethod
    def decode(s: str) -> bytes:
        return base64.b64decode(s)
