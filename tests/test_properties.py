"""Property-based tests (hypothesis) - beyond the reference's test
strategy (SURVEY.md §5 notes it has none): algebraic laws of the schema
classifier and replay invariances of the merge path."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataingestion_spark import oracle
from dataingestion_spark.lake import LakeTable
from dataingestion_spark.schema.evolution import (
    ChangeType,
    compare_schemas,
    is_compatible_type_change,
    merge_schemas,
)
from tests.util import TRANSCRIPT_SCHEMA, assert_table_equals_oracle

_TYPES = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(), T.TimestampType(),
    T.BooleanType(),
]

names = st.text(alphabet="abcdef", min_size=1, max_size=4)
fields = st.builds(
    T.StructField, names, st.sampled_from(_TYPES), st.booleans()
)
schemas = st.builds(
    lambda fs: T.StructType(list({f.name: f for f in fs}.values())),
    st.lists(fields, min_size=1, max_size=5),
)


@given(schemas)
def test_compare_reflexive(s):
    assert compare_schemas(s, s).change_type == ChangeType.NO_CHANGE


@given(schemas, fields)
def test_add_nullable_nonbreaking_remove_breaking(s, f):
    if f.name in [x.name for x in s.fields]:
        return
    added = T.StructType(list(s.fields) + [T.StructField(f.name, f.dataType, True)])
    assert compare_schemas(s, added).change_type == ChangeType.NON_BREAKING
    # the reverse direction (dropping a field) is breaking
    assert compare_schemas(added, s).change_type == ChangeType.BREAKING


@given(st.sampled_from(_TYPES), st.sampled_from(_TYPES), st.sampled_from(_TYPES))
def test_widening_lattice_transitive(a, b, c):
    """The reference's compatibility lattice must be transitively closed -
    otherwise two successive NON_BREAKING evolutions could compose into a
    state unreachable by one (SchemaEvolution.scala:94-108 analog)."""
    if is_compatible_type_change(a, b) and is_compatible_type_change(b, c):
        assert is_compatible_type_change(a, c), (a, b, c)


@given(schemas, schemas)
def test_merge_schemas_idempotent_and_superset(old, new):
    cmp = compare_schemas(old, new)
    if cmp.change_type != ChangeType.NON_BREAKING:
        return
    evolved = merge_schemas(old, new)
    # merging again changes nothing
    assert merge_schemas(evolved, new) == evolved
    assert compare_schemas(old, evolved).change_type in (
        ChangeType.NO_CHANGE, ChangeType.NON_BREAKING,
    )
    # every old field name survives (drop-column policy E6)
    assert {f.name for f in old.fields} <= {f.name for f in evolved.fields}


# --------------------------------------------------------------------------
# merge replay invariances (small Spark examples)
# --------------------------------------------------------------------------
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # conv
        st.integers(min_value=0, max_value=2),   # turn
        st.integers(min_value=0, max_value=30),  # lsn
    ),
    min_size=1,
    max_size=12,
)

_OPS = ["INSERT", "UPDATE", "DELETE"]


def _to_df(spark, raw):
    # op (and hence the whole payload) is a pure function of (key, lsn) so
    # events sharing (key, lsn) are EXACT re-deliveries - an LSN tie with
    # differing payloads is undefined in any LWW engine and never occurs
    # in a real binlog
    rows = [
        (
            op,
            f"conv_{c}",
            t,
            None if op == "DELETE" else "user",
            None if op == "DELETE" else f"text-{c}-{t}-lsn{lsn}",
            None,
            lsn,
        )
        for c, t, lsn in raw
        for op in [_OPS[(c + t + lsn) % 3]]
    ]
    schema = (
        "op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, lsn long"
    )
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_seconds(1_700_000_000 + F.col("lsn"))
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events_strategy, st.integers(min_value=1, max_value=3), st.booleans())
def test_merge_equals_oracle_under_any_epoch_split(spark, tmp_path_factory, raw, cuts, mor):
    """For ANY event stream, ANY contiguous epoch split, and either write
    mode, the engine's final state equals the sequential replay oracle.
    (Duplicate lsns for the same key are exact re-deliveries by
    construction here: payload derives from (key, lsn).)"""
    df = _to_df(spark, raw)
    pdf = df.toPandas()
    expected = oracle.replay(pdf)

    tmp = tmp_path_factory.mktemp("prop")
    tbl = LakeTable.create(
        spark, tmp / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=2,
    )
    hi = max(r[2] for r in raw) + 1
    step = hi // cuts + 1
    for e in range(cuts):
        part = df.filter(
            (F.col("lsn") >= e * step) & (F.col("lsn") < (e + 1) * step)
        )
        tbl.merge(
            part, pipeline_id="p", epoch_id=e,
            write_mode="mor" if mor else "cow",
        )
    assert_table_equals_oracle(tbl.read(), expected)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events_strategy,
    st.integers(min_value=0, max_value=2),
    st.booleans(),
)
def test_dml_equals_pandas_filter_for_any_stream(
    spark, tmp_path_factory, raw, pick, do_update
):
    """For ANY event stream and a key- or payload-valued predicate,
    delete_where equals the pandas filter of the replay oracle and
    update_where equals its projection - predicate DML commutes with the
    replay."""
    df = _to_df(spark, raw)
    expected = oracle.replay(df.toPandas())
    tmp = tmp_path_factory.mktemp("dmlprop")
    tbl = LakeTable.create(
        spark, tmp / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=2,
    )
    tbl.merge(df, pipeline_id="p", epoch_id=0)
    pred_sql = f"turn_idx = {pick}"
    hit = expected["turn_idx"] == pick
    if do_update:
        tbl.update_where(pred_sql, {"text": "X"})
        want = expected.copy()
        want.loc[hit, "text"] = "X"
    else:
        tbl.delete_where(pred_sql)
        want = expected[~hit]
    assert_table_equals_oracle(tbl.read(), want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events_strategy,
    st.integers(min_value=1, max_value=7),
    st.booleans(),
)
def test_rebucket_state_invariant_for_any_stream(
    spark, tmp_path_factory, raw, new_n, mor
):
    """For ANY event stream and ANY new bucket count, rebucketing
    mid-stream changes nothing about the final state: merge half, rebucket,
    merge the rest, and the table still equals the sequential replay."""
    df = _to_df(spark, raw)
    pdf = df.toPandas()
    expected = oracle.replay(pdf)
    tmp = tmp_path_factory.mktemp("rbprop")
    tbl = LakeTable.create(
        spark, tmp / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=2,
    )
    mid = (max(r[2] for r in raw) + 1) // 2
    tbl.merge(
        df.filter(F.col("lsn") < mid), pipeline_id="p", epoch_id=0,
        write_mode="mor" if mor else "cow",
    )
    tbl.rebucket(new_n)
    tbl.merge(
        df.filter(F.col("lsn") >= mid), pipeline_id="p", epoch_id=1,
        write_mode="mor" if mor else "cow",
    )
    assert_table_equals_oracle(tbl.read(), expected)
    assert tbl.snapshot().num_buckets == new_n


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events_strategy, st.integers(min_value=1, max_value=3))
def test_aggregate_view_equals_recompute_for_any_stream(
    spark, tmp_path_factory, raw, cuts
):
    """For ANY event stream and ANY epoch split, the incrementally
    maintained per-conversation view equals a fresh groupBy over the
    final state after every sync."""
    import pandas as pd

    from dataingestion_spark.lake.sync import sync_aggregate

    df = _to_df(spark, raw)
    tmp = tmp_path_factory.mktemp("aggprop")
    tbl = LakeTable.create(
        spark, tmp / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=2,
    )
    view_path = str(tmp / "view")
    hi = max(r[2] for r in raw) + 1
    step = hi // cuts + 1
    for e in range(cuts):
        part = df.filter(
            (F.col("lsn") >= e * step) & (F.col("lsn") < (e + 1) * step)
        )
        tbl.merge(part, pipeline_id="p", epoch_id=e)
        sync_aggregate(tbl, view_path, ["conv_id"], sums=["turn_idx"])
        got = (
            LakeTable(spark, view_path)
            .read()
            .toPandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        want = (
            tbl.read()
            .groupBy("conv_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("turn_idx").cast("long").alias("sum_turn_idx"),
            )
            .toPandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[want.columns], want, check_dtype=False
        )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events_strategy,
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=1, max_value=8),
    st.booleans(),
)
def test_zorder_read_equals_pandas_filter_for_any_stream(
    spark, tmp_path_factory, raw, lo, width, mor
):
    """For ANY stream and ANY (turn_idx, ts) range pair, a z-order
    compacted table's pruned read equals the pandas filter of the replay
    oracle - clustering and stats skipping are layout, never semantics."""
    df = _to_df(spark, raw)
    expected = oracle.replay(df.toPandas())

    tmp = tmp_path_factory.mktemp("zprop")
    tbl = LakeTable.create(
        spark, tmp / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=2,
    )
    tbl.merge(df, pipeline_id="p", epoch_id=0, write_mode="mor" if mor else "cow")
    tbl.set_sort_order(["turn_idx", "ts"], mode="zorder")
    tbl.compact(max_records_per_file=3)

    hi = lo + width
    t_lo = 1_700_000_000 + lo  # ts = base + lsn by construction
    import datetime as _dt

    bounds = {
        "turn_idx": (lo, hi),
        "ts": (
            _dt.datetime.utcfromtimestamp(t_lo),
            _dt.datetime.utcfromtimestamp(t_lo + 40),
        ),
    }
    got = (
        tbl.read(where=bounds)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = expected[
        expected.turn_idx.between(lo, hi)
        & (expected.ts >= bounds["ts"][0])
        & (expected.ts <= bounds["ts"][1])
    ]
    assert len(got) == len(exp)
    if len(exp):
        import pandas as pd

        cols = ["conv_id", "turn_idx", "role", "text", "ts"]
        pd.testing.assert_frame_equal(
            got[cols],
            exp[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
            check_dtype=False,
        )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events_strategy, st.booleans())
def test_read_in_equals_pandas_filter_for_any_stream(
    spark, tmp_path_factory, raw, mor
):
    """For ANY stream, a secondary-indexed read_in equals the pandas
    filter - including with UNINDEXED later epochs (their buckets stay
    kept) and under MOR overlays (bucket-granular pruning soundness)."""
    df = _to_df(spark, raw)
    expected = oracle.replay(df.toPandas())

    tmp = tmp_path_factory.mktemp("siprop")
    tbl = LakeTable.create(
        spark, tmp / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=2,
    )
    mid = max(r[2] for r in raw) // 2
    tbl.merge(
        df.filter(F.col("lsn") <= mid), pipeline_id="p", epoch_id=0,
        write_mode="mor" if mor else "cow",
    )
    tbl.update_secondary_index("text")
    tbl.merge(  # unindexed epoch on top
        df.filter(F.col("lsn") > mid), pipeline_id="p", epoch_id=1,
        write_mode="mor" if mor else "cow",
    )
    texts = [t for t in expected.text.dropna().unique()[:3]]
    values = texts + ["no-such-text"]
    got = sorted(
        (r.conv_id, r.turn_idx)
        for r in tbl.read_in("text", values).collect()
    )
    want = sorted(
        map(tuple, expected[expected.text.isin(values)][["conv_id", "turn_idx"]].values)
    )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events_strategy, st.integers(min_value=1, max_value=3), st.booleans())
def test_scd2_time_travel_equivalence_for_any_stream(
    spark, tmp_path_factory, raw, cuts, mor
):
    """For ANY event stream, ANY contiguous epoch split, and either
    write mode, syncing an SCD2 history after every epoch yields a
    history whose slice at EACH synced source version equals
    read(version=v) - the history is a faithful materialization of the
    whole snapshot chain, not just the head."""
    from dataingestion_spark.lake.sync import sync_scd2

    df = _to_df(spark, raw)
    tmp = tmp_path_factory.mktemp("scd2prop")
    tbl = LakeTable.create(
        spark, tmp / "t", TRANSCRIPT_SCHEMA,
        pk_fields=["conv_id", "turn_idx"], order_fields=["lsn", "ts"],
        num_buckets=2,
    )
    hist_path = str(tmp / "hist")
    hi = max(r[2] for r in raw) + 1
    step = hi // cuts + 1
    synced = []
    for e in range(cuts):
        part = df.filter(
            (F.col("lsn") >= e * step) & (F.col("lsn") < (e + 1) * step)
        )
        tbl.merge(
            part, pipeline_id="p", epoch_id=e,
            write_mode="mor" if mor else "cow",
        )
        sync_scd2(tbl, hist_path)
        synced.append(tbl.current_version())

    hist = LakeTable(spark, hist_path)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    def rows(d):
        return sorted(
            tuple(r[c] for c in cols) for r in d.select(*cols).collect()
        )

    for v in synced:
        sliced = hist.read().filter(
            (F.col("valid_from_lsn") <= v)
            & (
                F.col("valid_to_lsn").isNull()
                | (F.col("valid_to_lsn") > v)
            )
        )
        assert rows(sliced) == rows(tbl.read(version=v))
    # exactly the head's rows are flagged current
    assert rows(hist.read().filter(F.col("is_current"))) == rows(tbl.read())
