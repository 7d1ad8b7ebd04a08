"""Transformer-chain tests: loading by dotted path, fold application, and
each built-in's semantics vs its reference counterpart."""

from pyspark.sql import functions as F, types as T

from dataingestion_spark.functions.transformers import (
    add_ingest_timestamps,
    apply_chain,
    bucketize,
    build_chain,
    cast_columns,
    flatten_structs,
    json_to_struct,
    load_transformer,
    normalize_text,
    quality_flags,
)


def test_cast_columns(spark):
    df = spark.createDataFrame([("1", "2.5")], "a string, b string")
    out = cast_columns({"a": "int", "b": "double", "missing": "long"})(df)
    assert dict(out.dtypes) == {"a": "int", "b": "double"}
    row = out.collect()[0]
    assert row.a == 1 and row.b == 2.5


def test_flatten_structs(spark):
    df = spark.createDataFrame(
        [(1, {"city": "x", "zip": "90210"})],
        "id int, address struct<city:string, zip:string>",
    )
    out = flatten_structs(df)
    assert out.columns == ["id", "address_city", "address_zip"]
    assert out.collect()[0].address_city == "x"


def test_json_to_struct(spark):
    df = spark.createDataFrame([('{"k": 7, "v": "hi"}',)], "payload string")
    out = json_to_struct("payload", "k int, v string")(df)
    row = out.collect()[0]
    assert row.payload.k == 7 and row.payload.v == "hi"


def test_add_ingest_timestamps(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = add_ingest_timestamps(df)
    assert "ingestion_timestamp" in out.columns and "ingestion_date" in out.columns
    assert out.collect()[0].ingestion_timestamp is not None


def test_bucketize(spark):
    df = spark.createDataFrame([(50.0,), (300.0,), (2000.0,), (None,)], "amount double")
    t = bucketize("amount", "amount_category", [100.0, 1000.0], ["low", "medium", "high"])
    got = [r.amount_category for r in t(df).collect()]
    assert got == ["low", "medium", "high", None]


def test_bucketize_skips_missing_column(spark):
    df = spark.createDataFrame([(1,)], "id int")
    t = bucketize("amount", "c", [1.0], ["a", "b"])
    assert t(df).columns == ["id"]


def test_quality_flags(spark):
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("c", None)], "name string, val int"
    )
    out = quality_flags(["name", "val"])(df)
    assert [r.is_valid for r in out.collect()] == [True, False, False]


def test_normalize_text_pandas_udf(spark):
    df = spark.createDataFrame([("  hello   world \n",), (None,)], "text string")
    out = normalize_text("text")(df)
    got = [r.text for r in out.collect()]
    assert got[0] == "hello world"
    assert got[1] is None


def test_load_and_chain_by_dotted_path(spark):
    chain = build_chain(
        [
            "dataingestion_spark.functions.transformers:flatten_structs",
            {
                "path": "dataingestion_spark.functions.transformers:quality_flags",
                "args": {"required": ["id"]},
            },
        ]
    )
    df = spark.createDataFrame([(1, {"a": "x"})], "id int, s struct<a:string>")
    out = apply_chain(df, chain)
    assert out.columns == ["id", "s_a", "is_valid"]


def test_bare_name_discovery():
    """TransformerLoader-style candidate-name probing: bare names resolve
    against DISCOVERY_MODULES, CamelCase probes its snake_case form."""
    from dataingestion_spark.functions.transformers import load_transformer

    fn = load_transformer("flatten_structs")
    assert callable(fn)
    fn2 = load_transformer({"path": "NormalizeText", "args": {"column": "text"}})
    assert callable(fn2)
    import pytest

    with pytest.raises(ValueError, match="name discovery"):
        load_transformer("NoSuchTransformerAnywhere")


def test_pyfiles_zip_is_self_contained(tmp_path):
    """The spark-submit --py-files artifact imports without the repo on
    the path (what executors see on a real cluster)."""
    import subprocess
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.build_pyfiles import build

    z = build(tmp_path / "dataingestion_spark.zip")
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import dataingestion_spark.cli, dataingestion_spark.lake.sync, "
        "dataingestion_spark.operators.temporal; print('zip-import-ok')"
        % str(z)
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": ""},
    )
    assert "zip-import-ok" in r.stdout, r.stderr
