"""Pluggable DataFrame->DataFrame transformer chain.

Reference parity: the `Transformer` trait `transform(ds: Dataset[Row])`
(/root/reference/spark/src/main/scala/com/example/transform/BasicTransformers.scala:7-11)
loaded from S3 JARs via URLClassLoader
(/root/reference/spark/src/main/scala/com/example/core/TransformerLoader.scala:20-140)
and applied as a sequential fold
(/root/reference/spark/src/main/scala/com/example/Phase2Job.scala:113-124).

Here a transformer is any Python callable DataFrame -> DataFrame; configs
name them as dotted paths "pkg.module:factory" with optional kwargs - the
idiomatic substitute for JAR classloading, shipped via
``spark-submit --py-files``. All built-ins compose Column expressions only
(JVM-side, whole-stage-codegen) - no per-row Python anywhere.

Built-ins ported from the reference (same behavior, new payload):
  cast_columns            <- CastTransformer (BasicTransformers.scala:13-21)
  flatten_structs         <- FlattenTransformer (BasicTransformers.scala:23-37)
  json_to_struct          <- ArrayJsonToStructTypeTransformer (BasicTransformers.scala:39-50)
  add_ingest_timestamps   <- TimestampEnricher (sample-transformers/.../SampleTransformers.scala:11-16)
  bucketize               <- amount_category / quality CASE-WHEN patterns
                             (SampleTransformers.scala:27-31,51-55)
  quality_flags           <- null/boolean quality checks (SampleTransformers.scala:46-50)
  normalize_text          <- vectorized text normalization (pandas/Arrow UDF)
"""

from __future__ import annotations

import importlib
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

Transformer = Callable[[DataFrame], DataFrame]


# ---------------------------------------------------------------------------
# loading / validation / chaining (TransformerLoader + Phase2Job fold)
# ---------------------------------------------------------------------------
# Candidate-name probing for bare transformer names, the analog of the
# reference's class-name discovery patterns (TransformerLoader.scala:46-54
# tries common class names; :117-129 tries name-pattern x package
# combinations). A bare name "normalize_text" (or "NormalizeText") is
# probed against these module paths before failing.
DISCOVERY_MODULES = [
    "dataingestion_spark.functions.transformers",
    "transformers",
    "transform",
]


def _snake(name: str) -> str:
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0 and not name[i - 1].isupper():
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def _discover(name: str):
    """Probe DISCOVERY_MODULES for ``name`` (as given and snake_cased),
    mirroring TransformerLoader's candidate-name loop. Returns the first
    callable found, else None."""
    for mod_name in DISCOVERY_MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        for attr in (name, _snake(name)):
            obj = getattr(mod, attr, None)
            if callable(obj):
                return obj
    return None


def load_transformer(spec: str | dict) -> Transformer:
    """Resolve a transformer spec into a callable.

    Accepted forms:
      * "pkg.module:name" - explicit dotted path (callable or factory);
      * "name" / "CamelName" - bare name, discovered by probing
        DISCOVERY_MODULES (reference parity: TransformerLoader's
        candidate-class-name patterns, TransformerLoader.scala:46-54,117-129);
      * {"path": <either form>, "args": {...}} - calls the factory with
        kwargs.

    Validation mirrors TransformerLoader.validateTransformer
    (/root/reference/spark/src/main/scala/com/example/core/TransformerLoader.scala:145-165):
    the resolved object must be callable.
    """
    if isinstance(spec, str):
        path, kwargs = spec, None
    else:
        path, kwargs = spec["path"], spec.get("args")
    mod_name, _, attr = path.partition(":")
    bare = not attr
    if bare:
        obj = _discover(path)
        if obj is None:
            raise ValueError(
                f"transformer {path!r} not found by name discovery in "
                f"{DISCOVERY_MODULES}; use an explicit 'module:attr' path"
            )
    else:
        obj = getattr(importlib.import_module(mod_name), attr)
    if kwargs is not None:
        obj = obj(**kwargs)
    elif bare and not _takes_dataframe(obj):
        # a FACTORY discovered by bare name without args: instantiate with
        # its defaults (raises a clear TypeError if it has required params).
        # Explicit 'module:attr' specs keep the original contract - the
        # resolved object is returned as-is when no args are given, so a
        # plain transformer whose first parameter the heuristic can't
        # classify (e.g. ``def clean(frame):``) is never mis-invoked.
        obj = obj()
    if not callable(obj):
        raise TypeError(f"transformer {path!r} is not callable")
    return obj


def _takes_dataframe(obj) -> bool:
    """True when the callable is already a transformer (first parameter is
    the DataFrame), False when it is a config factory that must be called
    to PRODUCE the transformer. Distinguished by the first parameter's
    annotation/name - all transformers here and in user code take
    ``df: DataFrame`` first."""
    import inspect

    try:
        params = list(inspect.signature(obj).parameters.values())
    except (TypeError, ValueError):
        return True
    if not params:
        return False
    first = params[0]
    ann = first.annotation
    if ann is not inspect.Parameter.empty:
        return "DataFrame" in str(ann)
    return first.name in ("df", "dataframe", "batch", "frame", "sdf", "data", "ds")


def build_chain(specs: list[str | dict]) -> list[Transformer]:
    return [load_transformer(s) for s in specs]


def apply_chain(df: DataFrame, chain: list[Transformer]) -> DataFrame:
    """Sequential fold, exactly Phase2Job.scala:113-124."""
    for fn in chain:
        df = fn(df)
    return df


# ---------------------------------------------------------------------------
# built-in transformer factories
# ---------------------------------------------------------------------------
def cast_columns(casts: dict[str, str]) -> Transformer:
    """CastTransformer: cast named columns to target types."""

    def _t(df: DataFrame) -> DataFrame:
        for c, t in casts.items():
            if c in df.columns:
                df = df.withColumn(c, F.col(c).cast(t))
        return df

    return _t


def flatten_structs(df: DataFrame) -> DataFrame:
    """One-level struct flatten: struct.field -> struct_field columns
    (FlattenTransformer semantics, including dropping the struct col)."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            cols.extend(
                F.col(f"{f.name}.{sub.name}").alias(f"{f.name}_{sub.name}")
                for sub in f.dataType.fields
            )
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def json_to_struct(column: str, schema: str | T.DataType) -> Transformer:
    """Parse a JSON-string column into a typed struct (from_json); the
    explicit-schema replacement for the reference's sampled inference."""

    def _t(df: DataFrame) -> DataFrame:
        if column in df.columns:
            df = df.withColumn(column, F.from_json(F.col(column), schema))
        return df

    return _t


def add_ingest_timestamps(df: DataFrame) -> DataFrame:
    """TimestampEnricher: processing-time provenance columns."""
    return df.withColumn("ingestion_timestamp", F.current_timestamp()).withColumn(
        "ingestion_date", F.current_date()
    )


def bucketize(
    column: str, out: str, edges: list[float], labels: list[str]
) -> Transformer:
    """CASE/WHEN bucketing (amount_category pattern). len(labels) ==
    len(edges)+1; buckets are [-inf,e0), [e0,e1), ..., [eN,inf)."""
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")

    def _t(df: DataFrame) -> DataFrame:
        if column not in df.columns:
            return df  # conditional schema-aware skip (SampleTransformers.scala:25)
        expr = F.when(F.col(column) < edges[0], labels[0])
        for i in range(1, len(edges)):
            expr = expr.when(F.col(column) < edges[i], labels[i])
        expr = expr.otherwise(labels[-1])
        return df.withColumn(out, F.when(F.col(column).isNull(), None).otherwise(expr))

    return _t


def quality_flags(required: list[str], out: str = "is_valid") -> Transformer:
    """Boolean conjunction of non-null checks over required columns."""

    def _t(df: DataFrame) -> DataFrame:
        cond = F.lit(True)
        for c in required:
            if c in df.columns:
                cond = cond & F.col(c).isNotNull()
        return df.withColumn(out, cond)

    return _t


def normalize_text(column: str = "text") -> Transformer:
    """Vectorized text normalization (NFC-ish cleanup: strip, collapse
    whitespace) as an Arrow-batched pandas UDF - the template for any
    per-value logic the built-in functions can't express. Never per-row
    Python (BASELINE.json input_hint)."""

    @pandas_udf(T.StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.strip().str.replace(r"\s+", " ", regex=True)

    def _t(df: DataFrame) -> DataFrame:
        if column in df.columns:
            df = df.withColumn(column, _norm(F.col(column)))
        return df

    return _t
