"""Repetition quality filters (operators/repetition.py), stratified hash
sampling (operators/curation.py), and corpus search (operators/search.py).

Each family is also oracle-verified at the driver level (doc_repetition /
doc_stratified_sample / doc_tfidf_search); these tests pin the exact
per-row math and the plan shapes on hand-built corpora."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators.curation import (
    stratified_sample,
    stratified_sample_sql,
)
from dataingestion_spark.operators.repetition import (
    ngram_repetition,
    ngram_repetition_sql,
    repetition_filter,
)
from dataingestion_spark.operators.search import (
    inverted_index,
    tfidf_topk,
    tfidf_topk_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# ngram_repetition / repetition_filter
# ---------------------------------------------------------------------------


def test_ngram_repetition_exact_fractions(spark):
    # "a b a b a": bigrams = [a b, b a, a b, b a] -> total 4, top 2, dup 4
    df = _docs(spark, [(1, "a b a b a"), (2, "w x y z"), (3, "q")])
    out = {
        r["doc_id"]: r
        for r in ngram_repetition(df, n=2).collect()
    }
    assert out[1]["total_grams"] == 4
    assert out[1]["top_gram_frac"] == 0.5
    assert out[1]["dup_gram_frac"] == 1.0
    # all-distinct bigrams: top 1/3, dup 0
    assert out[2]["total_grams"] == 3
    assert out[2]["top_gram_frac"] == round(1 / 3, 6)
    assert out[2]["dup_gram_frac"] == 0.0
    # doc shorter than n tokens: zero grams, zero fractions
    assert out[3]["total_grams"] == 0
    assert out[3]["top_gram_frac"] == 0.0
    assert out[3]["dup_gram_frac"] == 0.0


def test_repetition_filter_thresholds_and_null(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam"),
            (2, "the quick brown fox jumps over the lazy dog at dawn today"),
            (3, None),
        ],
    )
    out = {r["doc_id"]: r["keep"] for r in repetition_filter(df, n=2).collect()}
    assert out[1] is False  # top bigram "spam spam" = 100% of grams
    assert out[2] is True
    assert out[3] is False  # null text never passes the gate


def test_ngram_repetition_matches_duckdb(spark):
    rows = [
        (1, "a b a b a c a b"),
        (2, "one two three four"),
        (3, "x"),
        (4, "t t t t t t"),
    ]
    df = _docs(spark, rows)
    got = sorted(
        ngram_repetition(df, n=2)
        .select("doc_id", "total_grams", "top_gram_frac", "dup_gram_frac")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" if t else f"({i}, NULL)" for i, t in rows)
        + ") AS v(doc_id, text)"
    )
    want = con.execute(
        ngram_repetition_sql(n=2)
        + "SELECT doc_id, total_grams, top_gram_frac, dup_gram_frac"
        " FROM rep_stats ORDER BY doc_id"
    ).fetchall()
    assert [tuple(r) for r in got] == want


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )
    rates = {"en": 1.0, "de": 0.25}
    out = stratified_sample(df, "doc_id", rates, stratum_col="lang")
    kept = out.where("sampled").groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in kept}
    assert by_lang["en"] == 1000  # rate 1.0 keeps everything
    assert 150 <= by_lang["de"] <= 350  # ~25% of 1000
    # determinism: identical decision on rerun and after repartition
    again = stratified_sample(
        df.repartition(7), "doc_id", rates, stratum_col="lang"
    )
    assert sorted(out.where("sampled").select("doc_id").collect()) == sorted(
        again.where("sampled").select("doc_id").collect()
    )


def test_stratified_sample_unlisted_stratum_dropped(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx")], "doc_id long, lang string"
    )
    out = stratified_sample(df, "doc_id", {"en": 1.0}, stratum_col="lang")
    got = {r["lang"]: r["sampled"] for r in out.collect()}
    assert got["en"] is True and got["xx"] is False


def test_stratified_sample_global_rate_matches_duckdb(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "doc_id", 0.3).where("sampled").collect()
    )
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT doc_id FROM (SELECT unnest(generate_series(0, 499)) AS"
            f" doc_id) WHERE {stratified_sample_sql('doc_id', 0.3)}"
            " ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want
    assert 100 <= len(got) <= 200  # ~30% of 500


def test_stratified_sample_requires_stratum_for_dict(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="stratum_col"):
        stratified_sample(df, "doc_id", {"en": 0.5})


def test_stratified_sample_is_projection_no_shuffle(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    plan = (
        stratified_sample(df, "doc_id", {"en": 0.5}, stratum_col="lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# inverted_index / tfidf_topk
# ---------------------------------------------------------------------------


def test_inverted_index_postings_and_counts(spark):
    df = _docs(spark, [(3, "b a b"), (1, "a b"), (2, "a a c")])
    out = {r["token"]: r for r in inverted_index(df).collect()}
    assert out["a"]["doc_freq"] == 3
    assert out["a"]["total_tf"] == 4
    assert out["a"]["postings"] == "1,2,3"  # ascending doc ids
    assert out["b"]["doc_freq"] == 2
    assert out["b"]["total_tf"] == 3
    assert out["b"]["postings"] == "1,3"
    assert out["c"]["postings"] == "2"


def test_inverted_index_truncates_postings_not_counts(spark):
    df = _docs(spark, [(i, "tok") for i in range(10)])
    out = inverted_index(df, max_postings=3).collect()[0]
    assert out["doc_freq"] == 10  # exact even though the list is cut
    assert out["postings"] == "0,1,2"


def test_tfidf_topk_exact_scores_and_tiebreak(spark):
    # n_docs=4; df(rare)=2 -> idf 2_000_000; df(common)=4 -> idf 1_000_000
    df = _docs(
        spark,
        [
            (1, "common rare"),
            (2, "common common"),
            (3, "common"),
            (4, "common rare rare"),
        ],
    )
    out = tfidf_topk(df, ["rare", "common"], k=10).collect()
    got = [(r["doc_id"], r["score"], r["rnk"]) for r in out]
    assert got == [
        (4, 5_000_000, 1),  # 2*2M + 1*1M
        (1, 3_000_000, 2),  # 1*2M + 1*1M
        (2, 2_000_000, 3),
        (3, 1_000_000, 4),
    ]


def test_tfidf_topk_matches_duckdb(spark):
    rows = [
        (1, "spark query engine fast"),
        (2, "query query plan"),
        (3, "the fast table scan scan"),
        (4, None),
        (5, ""),
    ]
    df = _docs(spark, rows)
    got = [
        tuple(r)
        for r in tfidf_topk(df, ["query", "scan", "fast"], k=3)
        .select("doc_id", "score", "rnk")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}')" if t is not None else f"({i}, CAST(NULL AS VARCHAR))"
            for i, t in rows
        )
        + ") AS v(doc_id, text)"
    )
    want = con.execute(tfidf_topk_sql(["query", "scan", "fast"], k=3)).fetchall()
    assert got == want


def test_tfidf_rejects_empty_or_duplicate_terms(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="non-empty"):
        tfidf_topk(df, [])
    with pytest.raises(ValueError, match="distinct"):
        tfidf_topk(df, ["a", "a"])


def test_tfidf_scoring_scan_is_shuffle_free_before_topk(spark):
    # The only exchange in the plan should belong to the TakeOrdered /
    # final single-partition step, never a join or aggregate of the
    # scoring scan itself (stats arrive via broadcast).
    df = _docs(spark, [(1, "a b"), (2, "b c")])
    plan = (
        tfidf_topk(df, ["a", "c"], k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
