"""Physical-plan shape assertions: the Catalyst properties the engine's
scale story depends on (SURVEY.md §4). If one of these regresses, the
operator still returns correct rows but stops scaling - so they are
pinned here.

- parquet filter/column pushdown reaches the scan (PushedFilters,
  ReadSchema pruned);
- small dims broadcast (BroadcastHashJoin, no shuffle of the fact side);
- LWW 'agg' strategy plans as hash aggregation with a partial
  (map-side-combining) phase before the exchange;
- scalar text operators stay inside WholeStageCodegen (no Python eval in
  the hot path).
"""

import __spark_entry__ as entry
from pyspark.sql import functions as F

from dataingestion_spark.operators.lww import lww_dedupe
from dataingestion_spark.operators.text import quality_score

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = _plan(entry.q_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 6 referenced columns - not the full table
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = _plan(entry.q_revenue_by_nation(spark, SF))
    assert "BroadcastHashJoin" in plan
    # the orders fact side must not be exchanged for the join itself:
    # the only Exchange below the join is the broadcast one
    assert "SortMergeJoin" not in plan


def test_lww_agg_strategy_has_partial_aggregate(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(lww_dedupe(ev, ["user_id"], ["ts", "event_id"], []))
    # struct-typed max_by plans as SortAggregate; the property that
    # matters at scale is the partial (map-side) phase before the exchange
    assert "partial_max_by" in plan, "map-side combine missing"
    # exactly one shuffle, keyed on the pk (formatted mode puts the
    # partitioning on the Exchange node's Arguments line)
    assert plan.count("hashpartitioning(user_id") == 1


def test_text_operators_stay_in_codegen(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(quality_score(docs).select("doc_id", "quality"))
    # '*' prefix = inside a WholeStageCodegen stage in formatted mode
    assert "* Project" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_merge_read_prunes_to_manifest_files(spark, tmp_path):
    """The manifest-driven read lists exact files (no directory scan) and
    carries the explicit physical schema (null-fill evolution semantics)."""
    from dataingestion_spark.lake import LakeTable
    from dataingestion_spark.sources.datagen import gen_changes
    from tests.util import TRANSCRIPT_SCHEMA

    tbl = LakeTable.create(
        spark, tmp_path / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=4,
    )
    tbl.merge(
        gen_changes(spark, n_events=500, n_convs=10, seed=5),
        pipeline_id="p", epoch_id=0,
    )
    some_bucket = int(next(iter(tbl.snapshot().files)))
    pruned = tbl.read(buckets=[some_bucket], include_system=True)
    full = tbl.read(include_system=True)
    # bucket restriction really prunes the file set (row subset, and the
    # pruned read only sees rows of that bucket)
    assert pruned.count() < full.count()
    assert pruned.filter(F.col("_bucket") != some_bucket).count() == 0


def test_cow_join_plan_shape_no_python_in_hot_path(spark, tmp_path):
    """Large-epoch COW plan: the in-batch dedup keeps its partial
    (map-side) combine, the batch-vs-table probe is a real join (not a
    nested loop), and no Python eval appears anywhere in the merge job."""
    from pyspark.sql import types as T
    from dataingestion_spark.lake import LakeTable
    from dataingestion_spark.sources.datagen import gen_changes
    from tests.util import TRANSCRIPT_SCHEMA

    tbl = LakeTable.create(
        spark, tmp_path / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=4,
    )
    tbl.merge(
        gen_changes(spark, n_events=500, n_convs=10, seed=50),
        pipeline_id="p", epoch_id=0,
    )
    # reproduce the large-epoch plan: conform + winners + full-outer join
    snap = tbl.snapshot()
    schema = snap.schema
    changes = gen_changes(spark, n_events=500, n_convs=10, seed=51)
    from dataingestion_spark.lake.table import (
        BUCKET_COL, DELETED_COL, LSN_COL, bucket_expr,
    )
    from dataingestion_spark.operators.lww import lww_dedupe

    src = (
        changes.withColumn(DELETED_COL, F.col("op") == "DELETE")
        .withColumn(LSN_COL, F.col("lsn").cast("long"))
    )
    src = tbl._conform(src, schema).withColumn(
        BUCKET_COL, bucket_expr("conv_id", snap.num_buckets)
    )
    winners = lww_dedupe(src, ["conv_id", "turn_idx"], [LSN_COL, "ts"])
    current = tbl._resolved(snap, None, schema=schema)
    joined = winners.join(current, ["conv_id", "turn_idx"], "full_outer")
    plan = _plan(joined)
    assert "partial_max_by" in plan, "in-batch dedup lost map-side combine"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dup_spans_no_cartesian_and_combinable_count(spark):
    """Span dedup must stay explode + hash-agg + equi-join: a cartesian or
    BNLJ here would be O(docs^2) at corpus scale."""
    plan = _plan(entry.q_doc_dup_spans(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan  # combinable occurrence count


def test_quantized_topk_broadcasts_queries_no_corpus_shuffle(spark):
    """The quantized scoring scan must keep the brute-force baseline's
    shape: queries broadcast, corpus never exchanged for the join."""
    plan = _plan(entry.q_embedding_quantized_topk(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_inverted_index_is_two_hash_aggregates(spark):
    """token index = per-(token,doc) count then per-token fold - both hash
    aggregates with map-side partials; no sort-based aggregation and no
    join anywhere."""
    plan = _plan(entry.q_doc_inverted_index(spark, SF))
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
