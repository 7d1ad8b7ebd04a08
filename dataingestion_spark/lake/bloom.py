"""File-level bloom index for point lookups - the metadata-table analog
of Hudi's bloom index (the reference's lake layer is Hudi, whose upsert
index IS a bloom index; see /root/reference/spark/src/main/scala/com/
example/core/SparkUtils.scala:131-146 for the Hudi table the reference
writes). The compaction writer already embeds parquet row-group bloom
filters (lake/table.py write path, ``parquet.bloom.filter.enabled#<pk>``)
- those skip data pages AFTER a file is opened. This index skips the
file OPEN itself: a driver-side bitmap per data file, consulted against
the requested keys before the scan is planned, so a point lookup on a
10^10-row table opens only the files that can possibly hold its keys.

Design:

* One bitmap per live data file (base and MOR delta alike), built from
  the file's pk columns. Classic Bloom parameters: ``m`` bits sized at
  ``bits_per_key`` per row rounded up to a power of two (capped), ``k``
  probes via Kirsch-Mitzenmacher double hashing ``(h1 + i*h2) mod m``.
* The key hash is pandas' SipHash-based ``hash_pandas_object`` with a
  pinned ``hash_key`` over the pk values rendered canonically in pk-field
  ORDER (rename-proof: renames change names, never values) - vectorized
  C-path on the build side, the identical function on the (tiny) query
  side. The hash never crosses engines, so portability to the DuckDB
  oracle is not required - lookups through the index must only EQUAL
  lookups without it, which the absence of false negatives guarantees.
* Sharded storage under ``_meta/bloom/``: a ``spec.json`` head pins the
  hash family and sizing; one ``bucket-<b>.json`` per bucket maps rel
  file path -> bitmap. Maintenance touches only buckets whose file sets
  changed (the two-level-manifest discipline); readers ignore entries
  for dead files and keep files with no entry - correctness never
  depends on index freshness.
* SOUNDNESS under merge-on-read: key-based file pruning is safe even
  with unresolved delta chains - every file that may contain a requested
  key is kept, so that key's read-time LWW resolution sees exactly the
  rows it would have seen; dropped files provably contain none of the
  requested keys. (Contrast payload-predicate pruning, which lake/
  table.py must disable under deltas.)

Scale shape: the build is O(new-file rows) per maintenance call and
embarrassingly parallel per file (the spark-local build reads pk columns
with pyarrow on the driver - the same stand-in posture as the stats
sidecar footer pass; a cluster port builds bitmaps executor-side in the
writer, as Hudi does). A lookup costs O(candidate_files x keys x k) bit
probes driver-side - microseconds against the file opens it saves.
"""

from __future__ import annotations

import base64
import zlib
from pathlib import Path

import numpy as np
import pandas as pd

from dataingestion_spark.lake.shardstore import ShardStore

# pinned hash key: pd.util.hash_pandas_object is SipHash-keyed and
# PYTHONHASHSEED-independent - deterministic across processes given the key
_HASH_KEY = "dataingestion.bloom1"[:16]
_SEP = "\x1f"
_NULL = "\x00null"

DEFAULT_BITS_PER_KEY = 10
DEFAULT_K = 7
MAX_BITS = 1 << 23  # 1 MiB bitmap cap per file


def _render(series: pd.Series) -> pd.Series:
    """Canonical text rendering of one pk column: str() of the value,
    NULL sentinel for missing. Builder (pyarrow->pandas) and reader
    (collected Spark rows) must agree, which restricts indexable pk
    types to strings and integers (see indexable_pk)."""
    s = series.astype(object)
    mask = s.isna()
    out = s.astype(str)
    if mask.any():
        out = out.where(~mask, _NULL)
    return out


def _hashes(pk_frame: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 arrays for the composite keys in ``pk_frame``
    (columns already in pk-field order)."""
    joined = _render(pk_frame.iloc[:, 0])
    for i in range(1, pk_frame.shape[1]):
        joined = joined + _SEP + _render(pk_frame.iloc[:, i])
    h1 = pd.util.hash_pandas_object(
        joined.reset_index(drop=True), index=False, hash_key=_HASH_KEY
    ).to_numpy(dtype=np.uint64)
    # derived second hash for double hashing; forced odd so the probe
    # stride never degenerates on a power-of-two m
    h2 = (h1 >> np.uint64(17)) ^ (h1 << np.uint64(31))
    h2 |= np.uint64(1)
    return h1, h2


def size_bits(n_rows: int, bits_per_key: int = DEFAULT_BITS_PER_KEY) -> int:
    """Bitmap size for ``n_rows`` keys: next power of two >= n*bits_per_key
    (power of two makes the probe a mask, and keeps m portable in the
    JSON spec), capped at MAX_BITS."""
    want = max(64, n_rows * bits_per_key)
    m = 64
    while m < want and m < MAX_BITS:
        m <<= 1
    return m


def build_bitmap(
    pk_frame: pd.DataFrame, bits_per_key: int = DEFAULT_BITS_PER_KEY,
    k: int = DEFAULT_K,
) -> dict:
    """Bloom entry for one file: {n, m, k, b} with the bitmap zlib+base64
    encoded. Vectorized end-to-end (SipHash C path + numpy probes)."""
    n = len(pk_frame)
    m = size_bits(n, bits_per_key)
    mask = np.uint64(m - 1)
    bits = np.zeros(m >> 3, dtype=np.uint8)
    if n:
        h1, h2 = _hashes(pk_frame)
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(bits, pos >> np.uint64(3),
                             np.left_shift(1, (pos & np.uint64(7)).astype(np.uint8),
                                           dtype=np.uint8))
    return {
        "n": n, "m": m, "k": k,
        "b": base64.b64encode(zlib.compress(bits.tobytes(), 6)).decode(),
    }


def _decode(entry: dict) -> np.ndarray:
    return np.frombuffer(zlib.decompress(base64.b64decode(entry["b"])),
                         dtype=np.uint8)


def any_key_maybe_present(entry: dict, h1: np.ndarray, h2: np.ndarray) -> bool:
    """True unless the bitmap PROVES none of the hashed keys is in the
    file (no false negatives by construction)."""
    if entry["n"] == 0:
        return False
    bits = _decode(entry)
    mask = np.uint64(entry["m"] - 1)
    alive = np.ones(len(h1), dtype=bool)
    for i in range(int(entry["k"])):
        if not alive.any():
            return False
        pos = (h1[alive] + np.uint64(i) * h2[alive]) & mask
        hit = (bits[(pos >> np.uint64(3)).astype(np.int64)]
               & np.left_shift(1, (pos & np.uint64(7)).astype(np.uint8),
                               dtype=np.uint8)) != 0
        nxt = np.zeros(len(h1), dtype=bool)
        nxt[np.flatnonzero(alive)[hit]] = True
        alive = nxt
    return bool(alive.any())


def key_hashes(key_tuples: list[tuple]) -> tuple[np.ndarray, np.ndarray]:
    """Hash a (small) list of composite key tuples with the builder's
    exact function."""
    frame = pd.DataFrame(key_tuples)
    return _hashes(frame)


_INDEXABLE = {"string", "byte", "short", "integer", "long"}


def indexable_pk(schema, pk_fields: list[str]) -> bool:
    """Only pk columns whose values render canonically the same from a
    pyarrow read and a collected Spark row are indexable: strings and
    integers. Anything else (float, timestamp, binary pks) skips the
    index entirely - lookups stay correct, just unindexed."""
    by_name = {f.name: f for f in schema.fields}
    return all(
        c in by_name and by_name[c].dataType.typeName() in _INDEXABLE
        for c in pk_fields
    )


# ---------------------------------------------------------------------------
# sharded on-disk index
# ---------------------------------------------------------------------------


class BloomIndexStore(ShardStore):
    """``_meta/bloom/`` instance of the shared shard-store layout
    (lake/shardstore.py): ``spec.json`` head + ``bucket-<b>.json``
    shards, every write tmp/rename."""

    def __init__(self, table_root: Path):
        super().__init__(table_root, "bloom")
