"""File-level column stats + data skipping (Delta add.stats / Iceberg
manifest-stats analog): per-commit sidecars of numeric/timestamp/string min-max,
and read(where=...) pruning files proven disjoint from the range. The
invariant everywhere: read(where=...) == read().filter(...) exactly -
skipping may only drop files that cannot match."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataingestion_spark.lake import LakeTable
from tests.util import TRANSCRIPT_SCHEMA

PK = ["conv_id", "turn_idx"]
UTC = dt.timezone.utc


def _make_table(spark, path, num_buckets=4):
    return LakeTable.create(
        spark,
        path,
        TRANSCRIPT_SCHEMA,
        pk_fields=PK,
        order_fields=["lsn", "ts"],
        num_buckets=num_buckets,
    )


def _day_batch(spark, day: int, n: int = 40):
    """One append batch: turn_idx in [day*100, day*100+n), ts inside day."""
    rows = [
        (
            f"conv_{i % 7}",
            day * 100 + i,
            "user",
            f"text {day}/{i}",
            None,
            dt.datetime(2024, 1, day, 12, 0, i % 60, tzinfo=UTC),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _pdf(df):
    return df.toPandas().sort_values(PK).reset_index(drop=True)


def test_append_commits_write_sidecars_and_prune(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir)
    for day in (1, 2, 3):
        tbl.append(_day_batch(spark, day), pipeline_id="a", epoch_id=day)
    # sidecars exist for every commit dir
    sidecars = list((tbl.root / "data").glob("*/.stats.json"))
    assert len(sidecars) == 3
    # prune by the int column: day 2's range only
    kept, total = tbl.candidate_files(where={"turn_idx": (200, 299)})
    n_kept = sum(len(v) for v in kept.values())
    assert n_kept < total and n_kept > 0
    assert n_kept * 3 == total  # exactly one of three appends survives
    # and by the timestamp column
    lo = dt.datetime(2024, 1, 2, tzinfo=UTC)
    hi = dt.datetime(2024, 1, 2, 23, 59, 59, tzinfo=UTC)
    kept_ts, total_ts = tbl.candidate_files(where={"ts": (lo, hi)})
    assert sum(len(v) for v in kept_ts.values()) * 3 == total_ts


def test_pruned_read_equals_filtered_read(spark, tmp_table_dir):
    tbl = _make_table(spark, tmp_table_dir)
    for day in (1, 2, 3):
        tbl.append(_day_batch(spark, day), pipeline_id="a", epoch_id=day)
    lo = dt.datetime(2024, 1, 2, tzinfo=UTC)
    hi = dt.datetime(2024, 1, 2, 23, 59, 59, tzinfo=UTC)
    got = _pdf(tbl.read(where={"ts": (lo, hi)}))
    want = _pdf(tbl.read().filter((F.col("ts") >= lo) & (F.col("ts") <= hi)))
    assert len(got) == 40
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # open bounds
    got_open = _pdf(tbl.read(where={"turn_idx": (300, None)}))
    want_open = _pdf(tbl.read().filter(F.col("turn_idx") >= 300))
    pd.testing.assert_frame_equal(got_open, want_open, check_dtype=False)


def test_mor_deltas_disable_file_pruning_but_stay_exact(spark, tmp_table_dir):
    """Under unresolved MOR overlays, file skipping must not apply (a
    pruned base file could flip a key's LWW winner); the residual filter
    alone answers, exactly. After compact() skipping resumes."""
    tbl = _make_table(spark, tmp_table_dir)
    tbl.append(_day_batch(spark, 1), pipeline_id="a", epoch_id=1)

    def batch(rows):
        return spark.createDataFrame(
            rows,
            "op string, conv_id string, turn_idx int, role string, text string,"
            " tool string, ts long, lsn long, source_file string",
        ).withColumn("ts", F.timestamp_seconds("ts"))

    # MOR update moves key (conv_0, 100)'s turn to a NEW text; its ts
    # changes too - a pruner looking only at base-file ts stats would keep
    # the stale base row
    tbl.merge(
        batch([("UPDATE", "conv_0", 100, "user", "patched", None, 2_000_000_000, 10, "f")]),
        pipeline_id="m",
        epoch_id=2,
        write_mode="mor",
    )
    lo = dt.datetime(2033, 1, 1, tzinfo=UTC)  # range covering only the patch
    got = _pdf(tbl.read(where={"ts": (lo, None)}))
    assert list(got["text"]) == ["patched"]
    tbl.compact()
    got2 = _pdf(tbl.read(where={"ts": (lo, None)}))
    pd.testing.assert_frame_equal(got, got2, check_dtype=False)
    # compacted table prunes again: day-1 range must drop the patch's file
    kept, total = tbl.candidate_files(where={"turn_idx": (0, 50)})
    assert sum(len(v) for v in kept.values()) < total or total == 0


def test_missing_sidecars_keep_everything(spark, tmp_table_dir, monkeypatch):
    monkeypatch.setattr(LakeTable, "COLLECT_FILE_STATS", False)
    tbl = _make_table(spark, tmp_table_dir)
    for day in (1, 2):
        tbl.append(_day_batch(spark, day), pipeline_id="a", epoch_id=day)
    kept, total = tbl.candidate_files(where={"turn_idx": (200, 299)})
    assert sum(len(v) for v in kept.values()) == total  # no stats -> no pruning
    got = _pdf(tbl.read(where={"turn_idx": (200, 299)}))
    want = _pdf(tbl.read().filter(F.col("turn_idx").between(200, 299)))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_unsupported_bound_type_keeps_all_files(spark, tmp_table_dir):
    """Bound types with no collected stats (binary here) never raise
    (round-4 advice fix): pruning keeps every file and the exact residual
    filter decides - identical behavior with or without MOR deltas."""
    tbl = _make_table(spark, tmp_table_dir)
    tbl.append(_day_batch(spark, 1), pipeline_id="a", epoch_id=1)
    kept, total = tbl.candidate_files(where={"text": (b"a", b"b")})
    assert sum(len(v) for v in kept.values()) == total


def _conv_batch(spark, prefix: str, n: int = 30):
    rows = [
        (
            f"{prefix}_{i:04d}",
            i,
            "user",
            f"text {prefix}/{i}",
            None,
            dt.datetime(2024, 1, 1, 12, 0, i % 60, tzinfo=UTC),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_string_range_prunes_and_equals_filtered(spark, tmp_table_dir):
    """String min/max skipping (round 4): commits with disjoint conv_id
    ranges prune by a string range, and the pruned read equals the plain
    filtered read exactly."""
    tbl = _make_table(spark, tmp_table_dir)
    for i, prefix in enumerate(("alpha", "mike", "zulu")):
        tbl.append(_conv_batch(spark, prefix), pipeline_id="a", epoch_id=i)
    kept, total = tbl.candidate_files(where={"conv_id": ("m", "n")})
    assert 0 < sum(len(v) for v in kept.values()) < total
    got = _pdf(tbl.read(where={"conv_id": ("m", "n")}))
    want = _pdf(tbl.read().filter(F.col("conv_id").between("m", "n")))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 30  # exactly the mike batch


def test_string_stat_truncation_keeps_valid_bounds(spark, tmp_table_dir):
    """Long strings sharing a >64-char prefix: the sidecar's truncated
    UPPER bound must be incremented (Iceberg truncate transform), or a
    file whose true max sorts above the bound would be wrongly pruned."""
    long_prefix = "x" * 70
    rows = [
        (long_prefix + suf, i, "user", "t", None,
         dt.datetime(2024, 1, 1, tzinfo=UTC))
        for i, suf in enumerate(["a", "b"])
    ]
    tbl = _make_table(spark, tmp_table_dir)
    tbl.append(
        spark.createDataFrame(rows, TRANSCRIPT_SCHEMA), pipeline_id="a",
        epoch_id=1,
    )
    # sidecar bounds are truncated yet valid
    stats = tbl._stats_for([f for fl in tbl.snapshot().files.values() for f in fl])
    for s in stats.values():
        lo, hi = s["conv_id"]
        assert len(lo) <= LakeTable._STAT_STR_TRUNC
        assert len(hi) <= LakeTable._STAT_STR_TRUNC
        assert lo <= long_prefix + "a" and hi >= long_prefix + "b"
    key = long_prefix + "b"
    got = _pdf(tbl.read(where={"conv_id": (key, key)}))
    want = _pdf(tbl.read().filter(F.col("conv_id") == key))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 1


def test_trunc_upper_properties():
    t = LakeTable._STAT_STR_TRUNC
    # the contract: _trunc_upper(s) >= s, always (valid upper bound)
    cases = [
        "x" * 100, "abc", "",
        "y" * (t - 1) + chr(0x10FFFF) + "zz",   # bump moves left one slot
        "s" * (t - 1) + "퟿" + "zz",         # increment skips surrogates
        chr(0x10FFFF) * (t + 5),                  # unincrementable: full value
    ]
    for s in cases:
        assert LakeTable._trunc_upper(s) >= s, repr(s)
    assert LakeTable._trunc_upper(chr(0x10FFFF) * (t + 5)) == chr(0x10FFFF) * (t + 5)
    up = LakeTable._trunc_upper("a" * 100)
    assert up == "a" * (t - 1) + "b" and len(up) == t
    # lower bound: a prefix sorts <= the full string
    assert LakeTable._trunc_lower("a" * 100) == "a" * t <= "a" * 100
