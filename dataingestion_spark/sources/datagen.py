"""Deterministic synthetic transcript CDC stream generator.

Produces the `transcript_changes` event log of FIXTURES.md §2: a
binlog/WAL-shaped stream of INSERT/UPDATE/DELETE over rows keyed by
(conv_id, turn_idx), with

  * Zipf-skewed conversation hotness (a few conversations get most events),
  * out-of-order arrival (lsn is monotone in generation order but events
    are scattered across arrival files by an independent hash),
  * duplicate deliveries (a configurable fraction of events are exact
    re-deliveries of earlier events, same lsn and payload),
  * an optional schema-v2 tail (adds nullable `tool_meta` and `latency_ms`
    columns - the reference's non-breaking add-column path,
    /root/reference/spark/src/main/scala/com/example/core/SchemaEvolution.scala:49-66).

Everything is a pure column expression over ``spark.range`` seeded through
``xxhash64`` - no driver-side RNG, no wall clock - so the same (seed, knobs)
always produce byte-identical data at any scale and any partitioning, and
generation itself distributes across executors (SURVEY.md §7.3: "generate
with Spark itself").

Event shape mirrors the reference's MySQL-binlog CDC test schema
(/root/reference/spark/src/test/scala/com/example/MultiSourceCDCTest.scala:43-51):
operation, primary key, payload, binlog position (here `lsn`), binlog file
(here `source_file`), timestamp.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PRIME = 1_000_000_007
_TS_BASE = 1_700_000_000  # 2023-11-14T22:13:20Z


def _u(col, seed: int, stream: int):
    """Deterministic uniform [0,1) derived from an id column."""
    return (
        F.pmod(F.xxhash64(col, F.lit(seed), F.lit(stream)), F.lit(_PRIME))
        / F.lit(float(_PRIME))
    )


def _h(col, seed: int, stream: int, mod: int):
    """Deterministic uniform integer in [0, mod)."""
    return F.pmod(F.xxhash64(col, F.lit(seed), F.lit(stream)), F.lit(mod))


def gen_changes(
    spark: SparkSession,
    n_events: int,
    n_convs: int = 100,
    max_turns: int = 50,
    n_files: int = 8,
    seed: int = 42,
    dup_frac: float = 0.05,
    insert_frac: float = 0.5,
    update_frac: float = 0.4,
    zipf_exp: float = 2.0,
    schema_version: int = 1,
    lsn_offset: int = 0,
    parallelism: int | None = None,
) -> DataFrame:
    """Build the change-event DataFrame.

    ``dup_frac`` of the rows are exact re-deliveries (same key, lsn and
    payload as an earlier event). ``zipf_exp > 1`` skews events toward low
    conversation ids: conv = floor(n_convs * u**zipf_exp).
    ``lsn_offset`` lets callers generate consecutive non-overlapping
    segments (e.g. a v2 tail after a v1 head).
    """
    n_base = int(n_events * (1.0 - dup_frac))
    n_base = max(n_base, 1)
    rng = spark.range(0, n_events, numPartitions=parallelism or spark.sparkContext.defaultParallelism)

    # Re-deliveries: rows past n_base clone the payload of a hashed earlier
    # event. Everything downstream derives from base_id, so a duplicate is
    # byte-identical to its original (matching at-least-once redelivery).
    base_id = F.when(F.col("id") < n_base, F.col("id")).otherwise(
        _h(F.col("id"), seed, 7, n_base)
    )
    df = rng.select(
        F.col("id").alias("_gen_id"), base_id.cast("long").alias("_base_id")
    )

    conv = F.floor(
        F.lit(n_convs) * F.pow(_u(F.col("_base_id"), seed, 1), F.lit(zipf_exp))
    ).cast("int")
    turn = _h(F.col("_base_id"), seed, 2, max_turns).cast("int")
    u_op = _u(F.col("_base_id"), seed, 3)
    op = (
        F.when(u_op < insert_frac, F.lit("INSERT"))
        .when(u_op < insert_frac + update_frac, F.lit("UPDATE"))
        .otherwise(F.lit("DELETE"))
    )
    lsn = (F.col("_base_id") * 2 + F.lit(lsn_offset)).cast("long")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (_h(F.col("_base_id"), seed, 4, 4) + 1).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.format_string("tool_%02d", _h(F.col("_base_id"), seed, 5, 20).cast("int")),
    ).otherwise(F.lit(None).cast("string"))
    ts = F.timestamp_seconds(F.lit(_TS_BASE) + F.col("_base_id"))
    conv_id = F.format_string("conv_%06d", conv)
    text = F.when(
        op == "DELETE", F.lit(None).cast("string")
    ).otherwise(
        F.format_string(
            "turn text %s/%d seq=%d %s",
            conv_id,
            turn,
            lsn,
            F.repeat(F.lit("x"), (_h(F.col("_base_id"), seed, 6, 64) + 8).cast("int")),
        )
    )
    source_file = F.format_string(
        "chunk_%05d", _h(F.col("_gen_id"), seed, 9, n_files).cast("int")
    )

    out = df.select(
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(op == "DELETE", F.lit(None).cast("string")).otherwise(role).alias("role"),
        text.alias("text"),
        F.when(op == "DELETE", F.lit(None).cast("string")).otherwise(tool).alias("tool"),
        ts.alias("ts"),
        lsn.alias("lsn"),
        source_file.alias("source_file"),
    )
    if schema_version >= 2:
        out = out.withColumn(
            "tool_meta",
            F.when(
                F.col("tool").isNotNull(),
                F.format_string('{"tool": "%s", "ok": true}', F.col("tool")),
            ).otherwise(F.lit(None).cast("string")),
        ).withColumn(
            "latency_ms",
            F.pmod(F.xxhash64("lsn", F.lit(seed), F.lit(11)), F.lit(5000)).cast("long"),
        )
    return out


def write_change_files(df: DataFrame, out_dir: str | Path) -> list[Path]:
    """Materialize the change stream as one Parquet file per `source_file`.

    Files land in a flat directory with their chunk names so a Structured
    Streaming file source can tail them in order - the sandbox stand-in for
    the Kafka topic of the reference's Phase-1
    (/root/reference/spark/src/main/scala/com/example/Phase1Job.scala:51-53).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    with tempfile.TemporaryDirectory() as tmp:
        # ONE Spark job: shuffle by chunk, write all chunk dirs in a single
        # partitioned pass, then rename driver-side (pure filesystem moves,
        # no per-chunk scan of the input).
        stage = Path(tmp) / "staged"
        (
            # duplicate dir column: partitionBy consumes _chunk while the
            # payload keeps its source_file column for downstream readers
            df.withColumn("_chunk", F.col("source_file"))
            .repartition(F.col("_chunk"))
            .write.partitionBy("_chunk")
            .mode("overwrite")
            .parquet(str(stage))
        )
        for chunk_dir in sorted(stage.glob("_chunk=*")):
            chunk = chunk_dir.name.split("=", 1)[1]
            parts = sorted(chunk_dir.glob("part-*.parquet"))
            for i, part in enumerate(parts):
                suffix = "" if len(parts) == 1 else f"_{i:03d}"
                dest = out / f"{chunk}{suffix}.parquet"
                shutil.move(str(part), dest)
                written.append(dest)
    return written
