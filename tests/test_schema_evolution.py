"""Schema-evolution classifier + lake-table evolution tests (SURVEY.md §5:
added nullable -> NON_BREAKING, removed/narrowed -> BREAKING fail-fast,
mid-stream add-column succeeds end-to-end)."""

import pytest
from pyspark.sql import functions as F, types as T

from dataingestion_spark import oracle
from dataingestion_spark.lake import LakeTable
from dataingestion_spark.schema.evolution import (
    ChangeType,
    SchemaEvolutionError,
    compare_schemas,
    is_compatible_type_change,
    merge_schemas,
)
from dataingestion_spark.sources.datagen import gen_changes
from tests.util import TRANSCRIPT_SCHEMA, assert_table_equals_oracle


def _s(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable in fields])


class TestClassifier:
    def test_no_change(self):
        a = _s(("x", T.IntegerType(), True))
        assert compare_schemas(a, a).change_type == ChangeType.NO_CHANGE

    def test_added_nullable_is_non_breaking(self):
        old = _s(("x", T.IntegerType(), True))
        new = _s(("x", T.IntegerType(), True), ("y", T.StringType(), True))
        cmp = compare_schemas(old, new)
        assert cmp.change_type == ChangeType.NON_BREAKING
        assert cmp.added == ["y"]

    def test_added_non_nullable_is_breaking(self):
        old = _s(("x", T.IntegerType(), True))
        new = _s(("x", T.IntegerType(), True), ("y", T.StringType(), False))
        assert compare_schemas(old, new).change_type == ChangeType.BREAKING

    def test_removed_field_is_breaking(self):
        old = _s(("x", T.IntegerType(), True), ("y", T.StringType(), True))
        new = _s(("x", T.IntegerType(), True))
        cmp = compare_schemas(old, new)
        assert cmp.change_type == ChangeType.BREAKING
        assert cmp.removed == ["y"]

    def test_widening_lattice(self):
        # reference lattice /root/reference/spark/.../SchemaEvolution.scala:94-108
        assert is_compatible_type_change(T.IntegerType(), T.LongType())
        assert is_compatible_type_change(T.FloatType(), T.DoubleType())
        assert is_compatible_type_change(T.IntegerType(), T.DoubleType())
        assert is_compatible_type_change(T.LongType(), T.DoubleType())
        assert is_compatible_type_change(T.LongType(), T.StringType())
        assert not is_compatible_type_change(T.LongType(), T.IntegerType())
        assert not is_compatible_type_change(T.DoubleType(), T.FloatType())
        assert not is_compatible_type_change(T.StringType(), T.LongType())

    def test_widened_field_is_non_breaking_and_merges(self):
        old = _s(("x", T.IntegerType(), True), ("y", T.StringType(), True))
        new = _s(("x", T.LongType(), True), ("y", T.StringType(), True))
        cmp = compare_schemas(old, new)
        assert cmp.change_type == ChangeType.NON_BREAKING
        assert cmp.modified == ["x"]
        merged = merge_schemas(old, new)
        assert merged["x"].dataType == T.LongType()

    def test_nullable_tightening_is_breaking(self):
        old = _s(("x", T.IntegerType(), True))
        new = _s(("x", T.IntegerType(), False))
        assert compare_schemas(old, new).change_type == ChangeType.BREAKING


class TestLakeEvolution:
    def test_mid_stream_add_column_succeeds(self, spark, tmp_table_dir):
        """v1 events then v2 events (adds tool_meta, latency_ms); final
        state must match an oracle replay over the union, with nulls for
        v1 rows' new columns."""
        tbl = LakeTable.create(
            spark, tmp_table_dir, TRANSCRIPT_SCHEMA,
            pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
            num_buckets=4,
        )
        v1 = gen_changes(spark, n_events=2_000, n_convs=25, seed=3)
        v2 = gen_changes(
            spark, n_events=2_000, n_convs=25, seed=3, schema_version=2,
            lsn_offset=1_000_000,
        )
        tbl.merge(v1, pipeline_id="t", epoch_id=0)
        tbl.merge(v2, pipeline_id="t", epoch_id=1)

        assert [f.name for f in tbl.snapshot().schema.fields] == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
            "tool_meta", "latency_ms",
        ]
        union = v1.withColumn("tool_meta", F.lit(None).cast("string")).withColumn(
            "latency_ms", F.lit(None).cast("long")
        ).unionByName(v2)
        expected = oracle.replay(
            union.toPandas(), extra_payload_cols=["tool_meta", "latency_ms"]
        )
        assert_table_equals_oracle(
            tbl.read(), expected,
            payload_cols=["role", "text", "tool", "ts", "tool_meta", "latency_ms"],
        )
        ledger = tbl.schema_ledger()
        assert ledger[-1]["schema_version"] == 2
        assert ledger[-1]["status"] == "ACTIVE"

    def test_breaking_change_fails_fast_and_blocks(self, spark, tmp_table_dir):
        tbl = LakeTable.create(
            spark, tmp_table_dir, TRANSCRIPT_SCHEMA,
            pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
            num_buckets=4,
        )
        # batch with `text` column REMOVED -> breaking -> fail fast
        bad = gen_changes(spark, n_events=100, n_convs=5, seed=4).drop("text")
        with pytest.raises(SchemaEvolutionError):
            tbl.merge(bad, pipeline_id="t", epoch_id=0)
        assert tbl.schema_ledger()[-1]["status"] == "BLOCKED"
        # table untouched
        assert tbl.current_version() == 1

    def test_incompatible_type_fails_fast(self, spark, tmp_table_dir):
        """A batch type neither conformable (upcastable into the table
        type) nor widenable is BREAKING and fails fast."""
        schema = T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("text", T.StringType()),
                T.StructField("big", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        )
        tbl = LakeTable.create(
            spark, tmp_table_dir, schema,
            pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
            num_buckets=2,
        )
        bad = spark.createDataFrame(
            [("INSERT", "c1", 0, "hi", True, 100, 1)],
            "op string, conv_id string, turn_idx int, text string, big boolean, ts long, lsn long",
        ).withColumn("ts", F.timestamp_seconds("ts"))
        with pytest.raises(SchemaEvolutionError):
            tbl.merge(bad, pipeline_id="t", epoch_id=0)

    def test_narrower_batch_conforms_by_upcast(self, spark, tmp_table_dir):
        """A batch field NARROWER than the table's (int arriving after the
        table widened to long) is not a schema change: it conforms by
        lossless upcast and the table schema stays put. (Deliberate
        divergence from the reference, which re-infers and would flag the
        narrower inferred schema as breaking - an operational trap when an
        upstream producer lags a widening.)"""
        schema = T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("text", T.StringType()),
                T.StructField("big", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        )
        tbl = LakeTable.create(
            spark, tmp_table_dir, schema,
            pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
            num_buckets=2,
        )
        narrower = spark.createDataFrame(
            [("INSERT", "c1", 0, "hi", 5, 100, 1)],
            "op string, conv_id string, turn_idx int, text string, big int, ts long, lsn long",
        ).withColumn("ts", F.timestamp_seconds("ts"))
        tbl.merge(narrower, pipeline_id="t", epoch_id=0)
        assert tbl.snapshot().schema["big"].dataType == T.LongType()
        assert tbl.snapshot().schema_version == 1
        got = tbl.read().toPandas()
        assert list(got["big"]) == [5]

    def test_int_widening_reads_old_files(self, spark, tmp_table_dir):
        """int->long widening: old files written as int must read back under
        the evolved long schema (native Spark 4 Parquet widening)."""
        schema = T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("text", T.StringType()),
                T.StructField("latency", T.IntegerType()),
                T.StructField("ts", T.TimestampType()),
            ]
        )
        tbl = LakeTable.create(
            spark, tmp_table_dir, schema,
            pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
            num_buckets=2,
        )
        b1 = spark.createDataFrame(
            [("INSERT", "c1", 0, "a", 5, 100, 1)],
            "op string, conv_id string, turn_idx int, text string, latency int, ts long, lsn long",
        ).withColumn("ts", F.timestamp_seconds("ts"))
        tbl.merge(b1, pipeline_id="t", epoch_id=0)
        b2 = spark.createDataFrame(
            [("INSERT", "c2", 0, "b", 6_000_000_000, 200, 2)],
            "op string, conv_id string, turn_idx int, text string, latency long, ts long, lsn long",
        ).withColumn("ts", F.timestamp_seconds("ts"))
        tbl.merge(b2, pipeline_id="t", epoch_id=1)
        got = tbl.read().toPandas().sort_values("conv_id").reset_index(drop=True)
        assert tbl.snapshot().schema["latency"].dataType == T.LongType()
        assert list(got["latency"]) == [5, 6_000_000_000]


class TestPendingLifecycle:
    """Reference PENDING -> ACTIVE promotion (LLD.md:103,110,122): an
    evolution REQUEST records a PENDING version; the next apply whose
    evolved schema matches it promotes it to ACTIVE."""

    def test_propose_then_apply_promotes_pending(self, spark, tmp_table_dir):
        tbl = LakeTable.create(
            spark, tmp_table_dir, TRANSCRIPT_SCHEMA,
            pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
            num_buckets=2,
        )
        proposed = T.StructType(
            list(TRANSCRIPT_SCHEMA.fields)
            + [T.StructField("tool_meta", T.StringType(), True)]
        )
        entry = tbl.propose_schema(proposed)
        assert entry["status"] == "PENDING"
        assert entry["schema_version"] == 2
        # table schema unchanged until an apply carries the new column
        assert tbl.snapshot().schema_version == 1

        v2 = gen_changes(
            spark, n_events=100, n_convs=5, seed=5, schema_version=2
        ).drop("latency_ms")
        tbl.merge(v2, pipeline_id="t", epoch_id=0)
        ledger = tbl.schema_ledger()
        assert ledger[-1]["status"] == "ACTIVE"
        assert ledger[-1]["previous_status"] == "PENDING"
        assert ledger[-1]["schema_version"] == 2
        assert tbl.snapshot().schema_version == 2

    def test_propose_noop_and_breaking(self, spark, tmp_table_dir):
        tbl = LakeTable.create(
            spark, tmp_table_dir, TRANSCRIPT_SCHEMA,
            pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
            num_buckets=2,
        )
        assert tbl.propose_schema(TRANSCRIPT_SCHEMA) is None
        dropped = T.StructType(TRANSCRIPT_SCHEMA.fields[:-1])  # removes ts
        with pytest.raises(SchemaEvolutionError):
            tbl.propose_schema(dropped)
        assert tbl.schema_ledger()[-1]["status"] == "BLOCKED"


class TestEvolutionPolicy:
    """evolution_policy gate (round 4): constrain which NON-breaking
    changes auto-apply - 'full' (default) = additions + widenings,
    'additive' = additions only, 'frozen' = none. Policy-blocked changes
    ledger as BLOCKED and obey fail_on_breaking like breaking ones."""

    def _mk(self, spark, path):
        return LakeTable.create(
            spark, path, TRANSCRIPT_SCHEMA,
            pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
            num_buckets=4,
        )

    def test_frozen_blocks_added_column(self, spark, tmp_table_dir):
        tbl = self._mk(spark, tmp_table_dir)
        tbl.merge(gen_changes(spark, n_events=200, n_convs=5, seed=8),
                  pipeline_id="t", epoch_id=0, evolution_policy="frozen")
        v2 = gen_changes(spark, n_events=200, n_convs=5, seed=8,
                         schema_version=2, lsn_offset=1_000)
        with pytest.raises(SchemaEvolutionError, match="evolution_policy=frozen"):
            tbl.merge(v2, pipeline_id="t", epoch_id=1,
                      evolution_policy="frozen")
        assert tbl.schema_ledger()[-1]["status"] == "BLOCKED"
        assert [f.name for f in tbl.snapshot().schema.fields] == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
        ]

    def test_frozen_skip_mode_conforms_batch(self, spark, tmp_table_dir):
        """fail_on_breaking=False + frozen: evolution skipped, the batch
        conforms to the pinned schema (extra columns dropped), rows land."""
        tbl = self._mk(spark, tmp_table_dir)
        tbl.merge(gen_changes(spark, n_events=200, n_convs=5, seed=9),
                  pipeline_id="t", epoch_id=0)
        v2 = gen_changes(spark, n_events=200, n_convs=5, seed=9,
                         schema_version=2, lsn_offset=1_000)
        snap = tbl.merge(v2, pipeline_id="t", epoch_id=1,
                         evolution_policy="frozen", fail_on_breaking=False)
        assert snap is not None
        assert "tool_meta" not in [f.name for f in tbl.snapshot().schema.fields]
        assert tbl.schema_ledger()[-1]["status"] == "BLOCKED"

    def test_additive_allows_add_blocks_widening(self, spark, tmp_table_dir):
        schema = T.StructType([
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("ts", T.TimestampType()),
        ])
        tbl = LakeTable.create(
            spark, tmp_table_dir, schema,
            pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
            num_buckets=2,
        )
        add = spark.createDataFrame(
            [("INSERT", "c1", 0, 1, "x", 100, 1)],
            "op string, conv_id string, turn_idx int, n int, extra string,"
            " ts long, lsn long",
        ).withColumn("ts", F.timestamp_seconds("ts"))
        snap = tbl.merge(add, pipeline_id="t", epoch_id=0,
                         evolution_policy="additive")
        assert snap is not None
        assert "extra" in [f.name for f in tbl.snapshot().schema.fields]
        widen = spark.createDataFrame(
            [("INSERT", "c2", 0, 2**40, "y", 101, 2)],
            "op string, conv_id string, turn_idx int, n long, extra string,"
            " ts long, lsn long",
        ).withColumn("ts", F.timestamp_seconds("ts"))
        with pytest.raises(SchemaEvolutionError, match="evolution_policy=additive"):
            tbl.merge(widen, pipeline_id="t", epoch_id=1,
                      evolution_policy="additive")
        # under the default full policy the same widening evolves
        snap2 = tbl.merge(widen, pipeline_id="t", epoch_id=1)
        assert snap2 is not None
        assert dict(
            (f.name, f.dataType.typeName()) for f in tbl.snapshot().schema.fields
        )["n"] == "long"

    def test_unknown_policy_rejected(self, spark, tmp_table_dir):
        tbl = self._mk(spark, tmp_table_dir)
        with pytest.raises(ValueError, match="unknown evolution_policy"):
            tbl.merge(gen_changes(spark, n_events=50, n_convs=5, seed=10),
                      pipeline_id="t", epoch_id=0, evolution_policy="strict")

    def test_policy_ignores_no_change_and_breaking_paths(self, spark, tmp_table_dir):
        """frozen must not affect a same-schema batch, and a BREAKING
        change still reports as breaking (not policy-blocked)."""
        tbl = self._mk(spark, tmp_table_dir)
        a = gen_changes(spark, n_events=200, n_convs=5, seed=11)
        tbl.merge(a, pipeline_id="t", epoch_id=0, evolution_policy="frozen")
        snap = tbl.merge(
            gen_changes(spark, n_events=200, n_convs=5, seed=12,
                        lsn_offset=1_000),
            pipeline_id="t", epoch_id=1, evolution_policy="frozen",
        )
        assert snap is not None
        bad = gen_changes(spark, n_events=50, n_convs=5, seed=13).drop("text")
        with pytest.raises(SchemaEvolutionError, match="breaking"):
            tbl.merge(bad, pipeline_id="t", epoch_id=2,
                      evolution_policy="frozen")
