"""Z-order (Morton) clustering expressions for compaction-time layout.

Multi-dimensional clustering, the Delta ``OPTIMIZE ZORDER BY`` / Iceberg
sort-order analog: interleave the bits of per-column quantized codes so
rows close in EVERY z column land close in the file order. One layout
then serves range/point predicates on all of the z columns at once -
the file-level min/max sidecars (lake/table.py candidate_files) get
tight ranges on each dimension when compaction splits a bucket into
several files, and parquet row-group min/max prune inside each file the
scan does open. Linear (lexicographic) clustering can only do this for
the leading column.

Everything here is a pure Catalyst Column expression (width_bucket +
shift/and/or, whole-stage-codegen'd JVM-side): no UDF, no extra job at
read time, and the only scan cost is at compaction - exactly where a
re-layout belongs. Quantization bounds come from the file-stats
sidecars when they cover the column (driver-side, zero jobs) with a
one-row aggregate fallback, so clustering a 100 TB table costs the
rewrite it was already paying plus nothing.

Quantization quality only affects CLUSTERING, never answers: a wrong
bound degrades to coarser interleaving; reads always apply the exact
residual filter on top of pruning.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Per-column code width. 16 bits = 65,536 quantiles per dimension -
# far finer than any realistic file count; capped so the interleaved
# code fits a signed 64-bit long for up to 4 columns at full width.
MAX_BITS = 16
MAX_ZORDER_COLS = 4

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

# String dimensions quantize on their first STRING_PREFIX_BYTES UTF-8
# bytes, read as a big-endian integer: 6 bytes = 48 bits, exact in a
# double (53-bit mantissa) and order-preserving for the prefix. Rows
# whose keys share the full prefix tie into one quantile - coarser
# clustering, never a wrong answer (reads keep the exact residual
# filter; file skipping uses the bound-preserving string min/max the
# sidecars already store).
STRING_PREFIX_BYTES = 6


def string_embed(s: str) -> int:
    """Driver-side embedding of a string bound into the SAME integer
    space :func:`norm_expr` uses executor-side: first 6 UTF-8 bytes,
    zero-padded, big-endian."""
    b = s.encode("utf-8")[:STRING_PREFIX_BYTES]
    return int.from_bytes(b.ljust(STRING_PREFIX_BYTES, b"\x00"), "big")


def is_zorderable(dtype: T.DataType) -> bool:
    """Types with a total order the quantizer can embed in a double:
    numerics, timestamps, dates, booleans, and strings (via the 6-byte
    UTF-8 prefix embedding - see STRING_PREFIX_BYTES)."""
    return isinstance(
        dtype,
        _NUMERIC
        + (T.TimestampType, T.DateType, T.BooleanType, T.StringType),
    )


def norm_expr(col: str, dtype: T.DataType) -> Column:
    """The column as a double in the SAME units the stats sidecars store
    (lake/table.py _stat_value): epoch-micros for timestamps, proleptic
    ordinal for dates - so sidecar-derived bounds line up exactly."""
    c = F.col(col)
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(c).cast("double")
    if isinstance(dtype, T.DateType):
        # datetime.date.toordinal(1970-01-01) == 719163
        return (F.datediff(c, F.lit("1970-01-01").cast("date")) + 719163).cast(
            "double"
        )
    if isinstance(dtype, T.BooleanType):
        return c.cast("int").cast("double")
    if isinstance(dtype, T.StringType):
        # first 6 UTF-8 bytes as a big-endian integer, via zero-padded
        # hex (hex digits 0-9A-F sort like the bytes they encode, and
        # right-padding with "0" pads with zero BYTES, so truncate-then-
        # pad preserves lexicographic order exactly). conv(..., 16, 10)
        # yields the integer as a decimal string; < 2^48 so the double
        # cast is exact and agrees with string_embed byte for byte.
        h = F.rpad(
            F.substring(
                F.hex(F.encode(c, "UTF-8")), 1, 2 * STRING_PREFIX_BYTES
            ),
            2 * STRING_PREFIX_BYTES,
            "0",
        )
        return F.conv(h, 16, 10).cast("double")
    if isinstance(dtype, _NUMERIC):
        return c.cast("double")
    raise ValueError(f"column {col!r} of type {dtype.simpleString()} "
                     "cannot be z-ordered")


def zorder_expr(
    cols: list[str],
    bounds: dict[str, tuple],
    schema: T.StructType,
) -> Column:
    """Morton-code Column over ``cols``: per column, quantize to a
    ``bits``-wide code via ``width_bucket`` between that column's
    [lo, hi] bounds, then interleave the codes bit-by-bit (column j owns
    bit positions ``i * k + j``). NULLs and values outside the bounds
    clamp to the edge codes; a degenerate bound (lo == hi, or unknown)
    contributes a constant 0 code - clustering quietly ignores a
    dimension it cannot quantize rather than failing the rewrite.

    ``bounds`` values are in stat units (see :func:`norm_expr`)."""
    k = len(cols)
    if not 1 <= k <= MAX_ZORDER_COLS:
        raise ValueError(f"zorder needs 1..{MAX_ZORDER_COLS} columns, got {k}")
    bits = min(MAX_BITS, 62 // k)
    n = 1 << bits
    by_name = {f.name: f.dataType for f in schema.fields}
    unknown = [c for c in cols if c not in by_name]
    if unknown:
        raise ValueError(f"zorder columns not in schema: {unknown}")
    codes: list[Column] = []
    for c in cols:
        lo, hi = bounds.get(c, (None, None))
        if (
            lo is None or hi is None
            or not isinstance(lo, (int, float))
            or not isinstance(hi, (int, float))
            or not float(lo) < float(hi)
        ):
            codes.append(F.lit(0).cast("long"))
            continue
        raw = (
            F.width_bucket(
                norm_expr(c, by_name[c]),
                F.lit(float(lo)), F.lit(float(hi)), F.lit(n),
            )
            - 1
        )
        codes.append(
            F.coalesce(
                F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)), F.lit(0)
            ).cast("long")
        )
    terms = [
        F.shiftleft(F.shiftright(code, i).bitwiseAND(F.lit(1)), i * k + j)
        for i in range(bits)
        for j, code in enumerate(codes)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("_zvalue")
