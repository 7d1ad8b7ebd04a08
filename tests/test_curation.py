"""Dataset-curation operators (operators/curation.py): deterministic hash
splits, n-gram decontamination, concat-and-chunk packing, vocabulary top-k.

These are the downstream dataset-assembly steps the reference pipeline
hands off after the lake write (Phase2Job consumers); each one is also
oracle-verified at the driver level (doc_hash_split / doc_decontaminate /
doc_pack_assign / doc_vocab_topk)."""

import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators.curation import (
    decontaminate,
    hash_split,
    pack_sequences,
    top_ngrams,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# hash_split
# ---------------------------------------------------------------------------


def test_hash_split_deterministic_and_stable_under_append(spark):
    """The same key must land in the same split regardless of which batch,
    partitioning, or row order it arrives in - the property rand() splits
    cannot give an incremental pipeline."""
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    full = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in hash_split(full, "k", w).collect()}
    # re-run on a shuffled, repartitioned subset: assignments identical
    sub = full.filter(F.col("k") % 3 == 0).repartition(7)
    b = {r["k"]: r["split"] for r in hash_split(sub, "k", w).collect()}
    assert all(a[k] == v for k, v in b.items())
    # proportions roughly honored (binomial tolerance on 1000 keys)
    from collections import Counter

    c = Counter(a.values())
    assert 740 <= c["train"] <= 860
    assert 60 <= c["val"] <= 140
    assert 60 <= c["test"] <= 140


def test_hash_split_seed_changes_assignment(spark):
    w = {"a": 0.5, "b": 0.5}
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    s1 = {r["k"]: r["split"] for r in hash_split(df, "k", w, seed=1).collect()}
    s2 = {r["k"]: r["split"] for r in hash_split(df, "k", w, seed=2).collect()}
    assert any(s1[k] != s2[k] for k in s1)


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_split(df, "k", {"a": 0.0})


# ---------------------------------------------------------------------------
# word_ngrams
# ---------------------------------------------------------------------------


def test_word_ngrams_exact_and_short_doc_empty(spark):
    docs = _docs(
        spark,
        [(1, "  A b C d "), (2, "x y"), (3, ""), (4, None)],
    )
    got = {
        (r["doc_id"], r["gram"]) for r in word_ngrams(docs, n=3).collect()
    }
    # doc 1: lowercased, trimmed -> "a b c", "b c d"; docs 2-4 too short
    assert got == {(1, "a b c"), (1, "b c d")}


def test_word_ngrams_n1_is_tokens(spark):
    docs = _docs(spark, [(1, "A  b a")])
    got = sorted(r["gram"] for r in word_ngrams(docs, n=1).collect())
    assert got == ["a", "a", "b"]


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_counts_distinct_shared_grams(spark):
    evals = _docs(spark, [(100, "p q r s")])  # grams(3): "p q r", "q r s"
    docs = _docs(
        spark,
        [
            (1, "p q r s t"),  # shares both eval grams -> overlap 2
            (2, "z p q r z p q r"),  # shares "p q r" twice -> DISTINCT 1
            (3, "totally clean text here"),  # overlap 0
        ],
    )
    got = {
        r["doc_id"]: (r["overlap"], r["contaminated"])
        for r in decontaminate(docs, evals, n=3, min_overlap=2).collect()
    }
    assert got == {1: (2, True), 2: (1, False), 3: (0, False)}


def test_decontaminate_broadcasts_eval_side(spark):
    evals = _docs(spark, [(100, "p q r s")])
    docs = _docs(spark, [(1, "p q r s t")])
    plan = decontaminate(docs, evals, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


def test_pack_sequences_concat_and_chunk_layout(spark):
    # shard "en", doc_id order, budget 10: token stream offsets
    #   d1 tokens=4  starts at 0   -> pack 0
    #   d2 tokens=5  starts at 4   -> pack 0
    #   d3 tokens=3  starts at 9   -> pack 0 (first token in pack 0)
    #   d4 tokens=8  starts at 12  -> pack 1
    #   d5 tokens=10 starts at 20  -> pack 2 (exact boundary)
    rows = [(i + 1, "en", t) for i, t in enumerate([4, 5, 3, 8, 10])]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(
            df, "n", budget=10, part_cols=["lang"], order_cols=["doc_id"]
        ).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}


def test_pack_sequences_shards_are_independent(spark):
    rows = [(1, "en", 7), (2, "en", 7), (1, "zh", 7), (2, "zh", 7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    got = {
        (r["lang"], r["doc_id"]): r["pack_id"]
        for r in pack_sequences(
            df, "n", budget=10, part_cols=["lang"], order_cols=["doc_id"]
        ).collect()
    }
    assert got == {("en", 1): 0, ("en", 2): 0, ("zh", 1): 0, ("zh", 2): 0}


def test_pack_sequences_requires_shard_key(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n long")
    with pytest.raises(ValueError):
        pack_sequences(df, "n", budget=10, part_cols=[], order_cols=["doc_id"])
    with pytest.raises(ValueError):
        pack_sequences(df, "n", budget=0, part_cols=["doc_id"], order_cols=["doc_id"])


def test_pack_sequences_null_tokens_are_zero_width(spark):
    df = spark.createDataFrame(
        [(1, "en", None), (2, "en", 10)], "doc_id long, lang string, n long"
    )
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(
            df, "n", budget=10, part_cols=["lang"], order_cols=["doc_id"]
        ).collect()
    }
    assert got == {1: 0, 2: 0}


# ---------------------------------------------------------------------------
# top_ngrams
# ---------------------------------------------------------------------------


def test_top_ngrams_counts_and_tiebreak(spark):
    docs = _docs(spark, [(1, "b a b c"), (2, "a c c")])
    got = [
        (r["rnk"], r["gram"], r["cnt"]) for r in top_ngrams(docs, n=1, k=2).collect()
    ]
    # counts: a=2, b=2, c=3 -> c first, then tie a/b broken by text asc
    assert sorted(got) == [(1, "c", 3), (2, "a", 2)]


def test_top_ngrams_bigrams(spark):
    docs = _docs(spark, [(1, "x y x y"), (2, "x y")])
    got = {(r["gram"], r["cnt"]) for r in top_ngrams(docs, n=2, k=10).collect()}
    assert got == {("x y", 3), ("y x", 1)}


def test_rare_token_filter_edges(spark):
    from dataingestion_spark.operators.curation import rare_token_filter

    docs = spark.createDataFrame(
        [
            # common vocabulary only (every token appears >= 3 times)
            ("d1", "the cat sat on the mat"),
            ("d2", "the cat sat on the mat the cat"),
            ("d3", "the mat sat on the cat"),
            # half rare garbage
            ("d4", "the cat zxqv9 qq7xk"),
            # all rare
            ("d5", "aa1 bb2 cc3"),
            # unassessable
            ("d6", None),
            ("d7", "   "),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in rare_token_filter(
            docs, min_count=2, max_rare_frac=0.5
        ).collect()
    }
    assert got["d1"]["keep"] and got["d1"]["n_rare"] == 0
    assert got["d4"]["n_tokens"] == 4 and got["d4"]["n_rare"] == 2
    assert got["d4"]["rare_frac"] == 0.5 and got["d4"]["keep"]
    assert got["d5"]["n_rare"] == 3 and not got["d5"]["keep"]
    for d in ("d6", "d7"):
        assert got[d]["n_tokens"] == 0 and got[d]["rare_frac"] is None
        assert got[d]["keep"] is False
    # repetition collapses in the first aggregate: occurrences of a
    # repeated token still count individually in n_tokens
    assert got["d2"]["n_tokens"] == 8
