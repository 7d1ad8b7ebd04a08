"""One CDC replay job at a given parallelism - the unit the scaling bench
runs at two parallelism levels (sandbox stand-in for N vs 4N executors).

Prints one JSON line: {"cpus": N, "events": M, "apply_sec": s,
"events_per_sec": eps, "final_rows": r}.

Methodology (single noisy shared box, see BENCH/BASELINE.md):
  * staged input is generated once per invocation from the same seed, so
    every parallelism level replays byte-identical data; generation/IO
    staging is excluded from the timed window (the metric is MERGE apply
    throughput, matching the reference's records/sec ingestion metric,
    /root/reference/PERFORMANCE_TUNING_GUIDE.md:460-474);
  * a small UNTIMED warm-up merge into a scratch table runs first so JVM
    class loading + whole-stage-codegen compilation (~3 s, parallelism-
    independent) doesn't pollute the timed window;
  * shuffle dirs and the bench table live on tmpfs (/dev/shm) so shared-
    disk bandwidth variance doesn't masquerade as CPU (non-)scaling.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataingestion_spark.lake import LakeTable
from dataingestion_spark.session import build_session
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA

SHM = "/dev/shm" if os.path.isdir("/dev/shm") else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-shm", action="store_true", help="keep data on disk")
    ap.add_argument(
        "--write-mode", default="cow", choices=["cow", "mor"],
        help="cow: rewrite touched buckets per epoch; mor: append delta "
        "files + read-time LWW (O(batch) write amplification)",
    )
    a = ap.parse_args()

    base = None if a.no_shm else SHM
    tmp = tempfile.mkdtemp(prefix=f"scaling_{a.cpus}_", dir=base)
    extra = {
        "spark.ui.enabled": "false",
        "spark.driver.memory": "48g",
    }
    if base:
        extra["spark.local.dir"] = f"{tmp}/spark-local"
    spark = build_session(
        app_name=f"cdc-scaling-{a.cpus}",
        master=f"local[{a.cpus}]",
        shuffle_partitions=max(a.cpus * 2, 16),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    staged = f"{tmp}/staged"
    changes = gen_changes(
        spark, n_events=a.events, n_convs=max(a.events // 200, 100),
        max_turns=64, n_files=a.epochs, seed=a.seed, zipf_exp=2.0, dup_frac=0.05,
    )
    # source_file is "chunk_%05d" with the index already in [0, n_files)
    changes.withColumn(
        "epoch", F.regexp_extract("source_file", r"(\d+)$", 1).cast("int")
    ).write.partitionBy("epoch").mode("overwrite").parquet(staged)

    # untimed warm-up: compiles the full merge codegen path on a scratch table
    warm = LakeTable.create(
        spark, f"{tmp}/warmup", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=4,
    )
    warm.merge(
        spark.read.parquet(f"{staged}/epoch=0").limit(10_000),
        pipeline_id="warmup", epoch_id=0,
    )
    warm.read().count()

    tbl = LakeTable.create(
        spark, f"{tmp}/table", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=a.buckets,
    )
    t0 = time.time()
    for e in range(a.epochs):
        tbl.merge(
            spark.read.parquet(f"{staged}/epoch={e}"),
            pipeline_id="scaling", epoch_id=e,
            write_mode=a.write_mode,
        )
    dt = time.time() - t0
    rows = tbl.read().count()
    shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": a.cpus,
                "events": a.events,
                "apply_sec": round(dt, 3),
                "events_per_sec": round(a.events / dt, 1),
                "final_rows": rows,
                "write_mode": a.write_mode,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
