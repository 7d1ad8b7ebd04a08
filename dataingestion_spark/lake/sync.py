"""Incremental table-to-table sync: chain CDC pipelines off the lake.

`sync_incremental(src, dst)` propagates committed changes from one lake
table into another by reading the changelog since the last synced source
version (`LakeTable.read_changes`) and MERGE-ing it downstream — the
medallion bronze→silver pattern, or a filtered/projected serving copy.
The reference ships one hop (Kafka → lake,
/root/reference/spark/src/main/scala/com/example/Phase2Job.scala); this
operator makes the lake itself a change SOURCE so hops compose.

Exactly-once without a new mechanism: the SOURCE SNAPSHOT VERSION is the
downstream epoch id, so the destination's existing epoch-marker
idempotency dedupes redeliveries — a crash after the destination commit
re-reads the same version range and is skipped whole; a crash before it
replays the same diff (the diff is a pure function of two immutable
snapshots, so the retry is byte-identical).

Scale shape: each hop costs one `read_changes` (bucket-pruned to the
source manifests that changed since the last sync, never a table scan)
plus one ordinary MERGE of the net diff. Because the diff is NET, a key
updated k times between syncs crosses the wire once — downstream write
amplification is bounded by the net change rate, not the upstream event
rate.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from dataingestion_spark.lake.table import LakeTable, Snapshot


def changes_to_batch(diff: DataFrame, lsn: int) -> DataFrame:
    """Convert a read_changes diff into a merge-able change batch:
    change_type → op (insert/update → full-row UPSERT semantics via
    INSERT/UPDATE, delete → DELETE), with the source snapshot version as
    the batch-wide lsn. One row per key (net diff), so in-batch LWW is
    trivially satisfied; across syncs the version is strictly increasing,
    so late redeliveries order correctly."""
    return diff.select(
        F.when(F.col("change_type") == "insert", F.lit("INSERT"))
        .when(F.col("change_type") == "update", F.lit("UPDATE"))
        .otherwise(F.lit("DELETE"))
        .alias("op"),
        *[c for c in diff.columns if c != "change_type"],
        F.lit(lsn).cast("long").alias("lsn"),
        F.lit(f"sync@v{lsn}").alias("source_file"),
    )


def sync_incremental(
    src: LakeTable,
    dst: LakeTable,
    pipeline_id: str = "sync",
    transform: Callable[[DataFrame], DataFrame] | None = None,
    write_mode: str = "cow",
) -> Snapshot | None:
    """One incremental hop: merge into ``dst`` everything committed to
    ``src`` since the last sync under ``pipeline_id``.

    ``transform`` (optional) maps the change batch (op + source columns)
    before the merge — project, filter, derive; it must keep the op/lsn
    columns and the pk. Filtering WHOLE KEYS out is safe (their deletes
    are filtered consistently too); value-dependent row filters are the
    caller's responsibility to keep consistent across updates.

    Returns the destination snapshot, or None when the source has no new
    commits. The FIRST sync seeds the destination with the source's full
    current state (as INSERTs), so it is correct even when the source's
    early snapshots have been expired; later syncs are incremental and
    raise if the cursor predates the source's retained history
    (expire_snapshots outran this consumer — the Kafka retention-loss
    analog; drop the destination's cursor to re-seed)."""
    cur = src.current_version()
    last = dst.last_applied_epoch(pipeline_id)
    if last >= cur:
        return None
    if last == -1:
        # initial seed: full state at cur, op=INSERT
        state = src.read(version=cur)
        batch = state.select(
            F.lit("INSERT").alias("op"),
            *state.columns,
            F.lit(cur).cast("long").alias("lsn"),
            F.lit(f"sync@v{cur}").alias("source_file"),
        )
        from_v = None
    else:
        retained = sorted(int(p.stem[1:]) for p in src._snap_dir.glob("v*.json"))
        if last not in retained:
            raise ValueError(
                f"sync cursor v{last} expired from source history "
                f"(oldest retained: v{retained[0]}); re-seed the destination"
            )
        from_v = last
        batch = changes_to_batch(src.read_changes(from_v, cur), lsn=cur)
    if transform is not None:
        batch = transform(batch)
    return dst.merge(
        batch,
        pipeline_id=pipeline_id,
        epoch_id=cur,
        write_mode=write_mode,
        lineage={"sync_from": from_v, "sync_to": cur},
    )
