"""Repetition-based quality filters for training corpora (Gopher-style).

The Gopher/MassiveText quality rules (Rae et al. 2021, public) gate
documents on how repetitive they are: the fraction of the text accounted
for by the single most frequent word n-gram, and the fraction covered by
n-grams that occur more than once. Highly repetitive documents (boiler-
plate, keyword stuffing, degenerate generations) are dropped before
training. The reference pipeline stops at the lake write; these filters
are part of the downstream curation pass the build brief asks for.

Both statistics are computed here on word-token counts (the fraction of
n-gram OCCURRENCES, which is the token-based analog of Gopher's character
fractions) so every step is exact integer arithmetic until one final
division of identical integers - bit-identical across engines, hence
DuckDB-oracle-verifiable.

Scale shape: explode docs into n-grams, count per (doc, gram) with a
map-side-combinable hash aggregate, then fold to per-doc stats with a
second combinable aggregate on doc_id alone, and left-join the stats back
onto the corpus (doc-keyed equi-join; at 100 TB both sides are hash-
partitioned on doc_id and the join is shuffle-local to the agg output).
Cost is O(total tokens); a pathologically long doc costs O(its tokens),
never O(tokens^2) - which is why this is explode+groupBy and NOT a
per-row higher-order-function pass (that variant is shuffle-free but
quadratic in document length, a trap at web scale where single documents
reach millions of tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataingestion_spark.operators.curation import word_ngrams


def ngram_repetition(
    df: DataFrame,
    n: int = 2,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Annotate each document with word ``n``-gram repetition statistics:

    - ``total_grams``: number of n-gram occurrences (tokens - n + 1; 0
      for docs shorter than ``n`` tokens, which are trivially non-
      repetitive and get 0.0 fractions).
    - ``top_gram_frac``: occurrences of the most frequent n-gram divided
      by total occurrences (Gopher "top n-gram fraction").
    - ``dup_gram_frac``: occurrences belonging to n-grams seen more than
      once, divided by total (Gopher "duplicate n-gram fraction").

    Fractions are one division of two exact integers, rounded to 6
    decimals - deterministic and identical in any IEEE engine.
    """
    grams = word_ngrams(df, col=col, n=n, id_col=id_col)
    per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("cnt").alias("total_grams"),
        F.max("cnt").alias("_top"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("_dup"),
    )
    total = F.coalesce(F.col("total_grams"), F.lit(0)).cast("long")
    frac = lambda c: F.when(  # noqa: E731 - local expr builder
        total > 0, F.round(F.coalesce(c, F.lit(0)) / total, 6)
    ).otherwise(F.lit(0.0))
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("top_gram_frac", frac(F.col("_top")))
        .withColumn("dup_gram_frac", frac(F.col("_dup")))
        .withColumn("total_grams", total)
        .drop("_top", "_dup")
    )


def repetition_filter(
    df: DataFrame,
    n: int = 2,
    max_top_frac: float = 0.20,
    max_dup_frac: float = 0.60,
    col: str = "text",
    id_col: str = "doc_id",
    out: str = "keep",
) -> DataFrame:
    """Gopher-style repetition gate: ``keep`` is true iff the doc's top-
    n-gram fraction and duplicate-n-gram fraction are both at or below
    their thresholds. Null text is dropped (keep=false): at training
    scale an empty doc carries no signal and the gate is the last filter
    before export."""
    stats = ngram_repetition(df, n=n, col=col, id_col=id_col)
    return stats.withColumn(
        out,
        F.col(col).isNotNull()
        & (F.col("top_gram_frac") <= max_top_frac)
        & (F.col("dup_gram_frac") <= max_dup_frac),
    )


def ngram_repetition_sql(
    n: int = 2,
    table: str = "documents",
    toks: str = r"regexp_split_to_array(trim(lower(text)), '\s+')",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ngram_repetition (CTE text, selects id + stats).

    Mirrors the engine exactly: same tokenizer, same short-doc zero
    handling, same single rounded division."""
    return f"""
        WITH toks AS (
          SELECT {id_col}, {toks} AS t FROM {table}
          WHERE text IS NOT NULL AND length(trim(text)) > 0
        ),
        grams AS (
          SELECT {id_col}, array_to_string(t[i:i+{n - 1}], ' ') AS g
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - {n - 1})) AS i)
        ),
        per_gram AS (
          SELECT {id_col}, g, count(*) AS cnt FROM grams GROUP BY 1, 2
        ),
        per_doc AS (
          SELECT {id_col},
                 CAST(sum(cnt) AS BIGINT) AS total_grams,
                 max(cnt) AS top_cnt,
                 sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_cnt
          FROM per_gram GROUP BY 1
        ),
        rep_stats AS (
          SELECT d.{id_col},
                 CAST(coalesce(p.total_grams, 0) AS BIGINT) AS total_grams,
                 CASE WHEN coalesce(p.total_grams, 0) > 0
                      THEN round(coalesce(p.top_cnt, 0)
                                 / CAST(p.total_grams AS BIGINT), 6)
                      ELSE 0.0 END AS top_gram_frac,
                 CASE WHEN coalesce(p.total_grams, 0) > 0
                      THEN round(coalesce(p.dup_cnt, 0)
                                 / CAST(p.total_grams AS BIGINT), 6)
                      ELSE 0.0 END AS dup_gram_frac
          FROM {table} d LEFT JOIN per_doc p USING ({id_col})
        )
    """
