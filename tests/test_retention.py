"""Row TTL (LakeTable.apply_retention): delete_where with the cutoff
doubling as a file-stats prune bound - on a time-clustered table the
age-out pass touches the aging boundary, never the table."""

import datetime

import pandas as pd
from pyspark.sql import functions as F

from dataingestion_spark import oracle
from dataingestion_spark.lake import LakeTable
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA, assert_table_equals_oracle

CUTOFF = datetime.datetime(2023, 11, 14, 23, 0, 0)  # _TS_BASE + 2800s


def test_retention_equality_and_boundary_pruning(spark, tmp_path):
    tbl = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=4,
    )
    ch = gen_changes(spark, n_events=6_000, n_convs=60, seed=23).persist()
    tbl.merge(ch, pipeline_id="p", epoch_id=0)
    state = oracle.replay(ch.toPandas())
    ch.unpersist()

    # time-cluster the layout so age-out has file-level locality
    tbl.compact(cluster_cols=["ts"], max_records_per_file=400)
    kept, total = tbl.candidate_files(where={"ts": (None, CUTOFF)})
    n_kept = sum(len(v) for v in kept.values())
    assert n_kept < total, "discovery must prune past-cutoff files"

    snap = tbl.apply_retention("ts", CUTOFF)
    assert snap is not None
    want = state[state.ts >= pd.Timestamp(CUTOFF)]
    assert 0 < len(want) < len(state)
    assert_table_equals_oracle(tbl.read(), want)

    # a second pass finds no matching live row: idempotent no-op commit
    assert tbl.apply_retention("ts", CUTOFF) is None
    assert_table_equals_oracle(tbl.read(), want)


def test_retention_composes_with_purge_chain(spark, tmp_path):
    tbl = LakeTable.create(
        spark, str(tmp_path / "t2"), TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=4,
    )
    ch = gen_changes(spark, n_events=2_000, n_convs=30, seed=29)
    tbl.merge(ch, pipeline_id="p", epoch_id=0)
    tbl.apply_retention("ts", CUTOFF)
    live = tbl.read().count()
    # physical erasure: purge tombstones below a quiesced watermark
    tbl.compact(purge_tombstones_below_lsn=tbl.next_lsn())
    phys = sum(
        r.row_count for r in tbl.meta("files").collect()
    )
    assert phys == live  # no tombstone bytes survive the purge
    assert tbl.read().filter(F.col("ts") < F.lit(CUTOFF)).count() == 0
