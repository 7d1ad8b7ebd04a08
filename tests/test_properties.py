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
