"""Text-analysis operators for large-scale training-data pipelines.

Not present in the reference (an ingestion platform); added as first-class
engine capabilities per the build brief: language-ID (stopword heuristic),
quality scoring (length/punct/stopword ratios), token counting (whitespace +
word-regex), and document fingerprinting (content hash). All pure Column
expressions - JVM-side, whole-stage codegen, no Python in the hot path -
and all chosen to be ANSI-SQL-expressible so the DuckDB oracle can verify
them value-for-value.

Scale: every operator here is embarrassingly parallel (per-row), shuffles
nothing, and pushes column pruning to the Parquet scan (only `text` + key
columns are read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (public knowledge). Chosen to be
# unambiguous between the languages and cheap to count.
STOPWORDS = {
    "en": ["the", "and", "is", "of", "to"],
    "de": ["der", "und", "die", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "y", "las"],
}


def tokens_expr(col: str = "text") -> Column:
    """Whitespace tokenization of lowercased, trimmed text; empty -> []."""
    return F.when(
        F.length(F.trim(F.col(col))) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.lower(F.col(col))), r"\s+"))


def token_count(df: DataFrame, col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count (null text -> null)."""
    return df.withColumn(
        out,
        F.when(F.col(col).isNull(), None).otherwise(
            F.size(tokens_expr(col)).cast("long")
        ),
    )


def word_count(df: DataFrame, col: str = "text", out: str = "n_words") -> DataFrame:
    """BPE-ish sub-word unit count: runs of letters, runs of digits, or a
    single non-space-non-alnum symbol each count as one unit."""
    return df.withColumn(
        out,
        F.when(F.col(col).isNull(), None).otherwise(
            F.regexp_count(F.col(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
            .cast("long")
        ),
    )


def stopword_ratio(col: str, lang: str) -> Column:
    toks = tokens_expr(col)
    hits = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS[lang]))
    )
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def language_id(df: DataFrame, col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Pick the language whose stopword set matches the largest share of
    tokens; 'und' (undetermined) when nothing matches."""
    ratios = {lang: stopword_ratio(col, lang) for lang in STOPWORDS}
    best = F.greatest(*ratios.values())
    expr = F.when(F.col(col).isNull() | (best <= 0), F.lit("und"))
    # deterministic preference order on ties: en, de, fr, es
    for lang in ["en", "de", "fr", "es"]:
        expr = expr.when(ratios[lang] == best, F.lit(lang))
    return df.withColumn(out, expr)


def quality_score(df: DataFrame, col: str = "text", out: str = "quality") -> DataFrame:
    """Composite [0,1] quality score from length, alpha ratio and
    punctuation density - the CASE/WHEN scoring pattern of the reference's
    data_quality_score transformer
    (/root/reference/sample-transformers/src/main/scala/com/example/transformers/SampleTransformers.scala:51-55)
    applied to document text."""
    length = F.length(F.col(col))
    alpha = F.length(F.regexp_replace(F.col(col), r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(F.col(col), r"[^.,;:!?]", ""))
    alpha_ratio = F.when(length > 0, alpha / length).otherwise(F.lit(0.0))
    punct_ratio = F.when(length > 0, punct / length).otherwise(F.lit(0.0))
    len_score = (
        F.when(length >= 200, F.lit(1.0))
        .when(length >= 50, F.lit(0.7))
        .when(length >= 10, F.lit(0.4))
        .otherwise(F.lit(0.0))
    )
    score = F.round(
        0.5 * len_score
        + 0.4 * alpha_ratio
        + 0.1 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))),
        6,
    )
    return df.withColumn(out, F.when(F.col(col).isNull(), None).otherwise(score))


def fingerprint(df: DataFrame, col: str = "text", out: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text - identical in any ANSI engine with md5()."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")
    return df.withColumn(
        out, F.when(F.col(col).isNull(), None).otherwise(F.md5(norm))
    )


# Portable PII patterns: written to mean the same thing in Java regex
# (Spark) and RE2 (DuckDB) - no lookarounds, no backreferences - so the
# oracle can replay the redaction value-for-value.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # card before phone: a 16-digit run would otherwise be half-eaten by
    # the shorter phone shape
    ("card", r"\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}", "<CARD>"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    ("phone", r"(?:\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}", "<PHONE>"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "<SSN>"),
]


def redact_pii(
    df: DataFrame, col: str = "text", out: str | None = None
) -> DataFrame:
    """Scrub common PII shapes (emails, 16-digit card numbers, IPv4
    addresses, NANP-style phone numbers, SSNs) from a text column - the
    redaction pass a training-data pipeline runs before anything leaves
    the lake. Pure chained ``regexp_replace`` Column expressions
    (JVM-side, codegen, no Python); order matters and is fixed: emails
    first (their local part may contain digits), then cards (16 digits
    would otherwise be half-eaten by the shorter phone shape), IPv4,
    phones, then SSNs (a bare SSN shape is only tagged if the longer
    phone shape didn't already consume it).

    For redaction of rows already IN a lake table, compose with
    ``LakeTable.update_where`` - this operator is the batch/streaming
    column transform, that one is the in-place DML."""
    expr = F.col(col)
    for _name, pat, tag in PII_PATTERNS:
        expr = F.regexp_replace(expr, pat, tag)
    return df.withColumn(out or col, expr)
