"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
the given sf dir; compare row count, column names, and order-insensitive
values. Usage: python tools/check_entry.py [sf_dir]"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from dataingestion_spark.session import build_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("float64")  # unify int widths/nullables
        elif df[c].dtype.kind == "b":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = build_session(master="local[8]", shuffle_partitions=16,
                          extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    ran = [n for n in queries if not only or n in only]
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows={len(got)} ({dt:.1f}s) [rows-only, no oracle]")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rowcount {len(got)} != {len(want)}"))
            print(f"FAIL  {name}: rowcount {len(got)} != {len(want)}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append((name, f"columns {sorted(got.columns)} != {sorted(want.columns)}"))
            print(f"FAIL  {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            continue
        # Driver hash-strictness emulation (round-3 lesson): the driver
        # stringifies values, so DuckDB sum(INTEGER)->HUGEINT->float64
        # hashes "734.0" against Spark's "734" and fails even when the
        # values are identical. Flag any column whose dtype KIND differs
        # (int vs float vs object) between the two engines before the
        # tolerant value compare papers over it.
        kind_mismatch = [
            c
            for c in sorted(got.columns)
            if got[c].dtype.kind != want[c].dtype.kind
            and {got[c].dtype.kind, want[c].dtype.kind} <= {"i", "u", "f"}
            and not (got[c].dtype.kind in "iu" and want[c].dtype.kind in "iu")
        ]
        if kind_mismatch:
            failures.append((name, f"dtype-kind mismatch {kind_mismatch}"))
            print(
                f"FAIL  {name}: dtype-kind mismatch (driver hash would "
                f"differ): "
                + ", ".join(
                    f"{c} spark={got[c].dtype} duckdb={want[c].dtype}"
                    for c in kind_mismatch
                )
            )
            continue
        g, w = canon(got), canon(want)
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, atol=1e-6)
            print(f"OK    {name}: rows={len(got)} ({dt:.1f}s)")
        except AssertionError as e:
            failures.append((name, "value mismatch"))
            diff = (g != w).any(axis=1) if g.shape == w.shape else None
            print(f"FAIL  {name}: value mismatch; first lines:\n{str(e)[:400]}")
            if diff is not None and diff.any():
                idx = diff[diff].index[:3]
                print("  got:\n", g.loc[idx].to_string())
                print("  want:\n", w.loc[idx].to_string())
    print(f"\n{len(ran) - len(failures)}/{len(ran)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
