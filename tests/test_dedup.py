"""Dedup operator tests: exact groups, MinHash-LSH recall on known
near-dups, Jaccard exactness vs a Python reference, SimHash proximity."""

import itertools

from pyspark.sql import functions as F

from dataingestion_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    lsh_candidates,
    minhash_near_duplicates,
    minhash_signatures,
    shingled,
    simhash,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again for fun"
    near = base.replace("lazy", "sleepy")  # one-word change -> high jaccard
    far = "completely different content about spark engines and parquet files here"
    rows = [
        (0, base),
        (1, base),                      # exact dup of 0
        (2, "  THE  quick brown fox jumps over the lazy dog again and again for fun "),  # normalized dup of 0
        (3, near),                      # near dup of 0
        (4, far),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_groups(spark):
    groups = exact_duplicates(_docs(spark)).collect()
    assert len(groups) == 1
    assert groups[0].keep_id == 0
    assert groups[0].group_size == 3


def test_dedup_exact_keeps_min_id_and_nulls(spark):
    kept = dedup_exact(_docs(spark)).toPandas().sort_values("doc_id")
    assert list(kept["doc_id"]) == [0, 3, 4, 5]


def test_minhash_finds_near_duplicate(spark):
    pairs = minhash_near_duplicates(
        _docs(spark), num_hashes=16, num_bands=8, threshold=0.5
    ).toPandas()
    got = {tuple(r) for r in pairs[["id_a", "id_b"]].itertuples(index=False)}
    # the exact-dup pairs and the near-dup pair must surface
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert (0, 3) in got or (1, 3) in got  # near dup caught by some band
    assert not any(4 in p for p in got)  # unrelated doc never pairs


def test_jaccard_matches_python_reference(spark):
    df = _docs(spark).filter(F.col("text").isNotNull())
    sh = shingled(df, n=3)
    sigs = minhash_signatures(sh, num_hashes=16)
    cands = lsh_candidates(sigs, num_bands=8)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(sh, cands, threshold=0.0).collect()
    }
    # python reference on the same shingle sets
    pdf = df.toPandas()
    def sh_set(text):
        toks = " ".join(text.lower().split()).split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    sets = {r.doc_id: sh_set(r.text) for r in pdf.itertuples(index=False)}
    for (a, b), j in got.items():
        ref = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        assert abs(j - ref) < 1e-6, (a, b, j, ref)


def test_simhash_near_dup_has_close_fingerprint(spark):
    fps = {r.doc_id: r.simhash for r in simhash(_docs(spark), bits=32, n=2).collect()}
    assert fps[0] == fps[1] == fps[2]  # identical content -> identical fp
    ham_near = bin(fps[0] ^ fps[3]).count("1")
    ham_far = bin(fps[0] ^ fps[4]).count("1")
    assert ham_near < ham_far
    assert ham_near <= 8


def test_duplicate_clusters_transitive_chain(spark):
    from dataingestion_spark.operators.dedup import duplicate_clusters

    # chain 1-2, 2-3 plus separate component 10-11: exact transitive
    # closure, unlike dedup_near's greedy rule
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_duplicate_clusters_long_chain_and_direction(spark):
    from dataingestion_spark.operators.dedup import duplicate_clusters

    # a 9-hop path given in descending orientation: label propagation
    # must still reach the far end (one hop per round, both directions)
    pairs = spark.createDataFrame(
        [(i + 1, i) for i in range(9)], "id_a long, id_b long"
    )
    got = duplicate_clusters(pairs).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert {r["doc_id"] for r in got} == set(range(10))


def test_duplicate_clusters_matches_duckdb_recursive(spark):
    import duckdb

    from dataingestion_spark.operators.dedup import duplicate_clusters

    edges = [(1, 5), (5, 9), (2, 3), (7, 8), (8, 9)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = sorted(
        (r["doc_id"], r["cluster_id"]) for r in duplicate_clusters(pairs).collect()
    )
    vals = ", ".join(f"({a}, {b})" for a, b in edges)
    want = duckdb.sql(
        f"""
        WITH RECURSIVE pairs(id_a, id_b) AS (VALUES {vals}),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS id FROM edges),
        reach AS (
          SELECT id, id AS lab FROM nodes
          UNION
          SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
        )
        SELECT id, min(lab) FROM reach GROUP BY id ORDER BY id
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_duplicate_spans_exact_positions(spark):
    from dataingestion_spark.operators.dedup import duplicate_spans

    # docs 1 and 2 share the 3-token run "x y z" (doc 2 at two offsets);
    # doc 3 shares nothing
    df = spark.createDataFrame(
        [
            (1, "a b x y z c"),
            (2, "x y z q x y z"),
            (3, "p q r s t u v"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in duplicate_spans(df, window=3, min_count=2).collect()
    )
    assert got == [(1, 2), (2, 0), (2, 4)]


def test_span_dedup_stats_interval_union(spark):
    from dataingestion_spark.operators.dedup import span_dedup_stats

    # doc 2's spans at pos 0 and 4 with window 3 are disjoint -> 6 covered
    # tokens of 7; doc 1 covers 3 of 6; doc 3 covers nothing; doc 4 (null)
    # is zero everywhere
    df = spark.createDataFrame(
        [
            (1, "a b x y z c"),
            (2, "x y z q x y z"),
            (3, "p q r s t u v"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["dup_tokens"], r["dup_frac"])
        for r in span_dedup_stats(df, window=3, min_count=2).collect()
    }
    assert got[1] == (6, 1, 3, 0.5)
    assert got[2] == (7, 2, 6, round(6 / 7, 6))
    assert got[3] == (7, 0, 0, 0.0)
    assert got[4] == (0, 0, 0, 0.0)


def test_span_dedup_overlapping_spans_coverage(spark):
    from dataingestion_spark.operators.dedup import span_dedup_stats

    # "w1 w2 w3 w4" repeated -> doc has windows at every offset duplicated
    # against the twin doc; overlapping spans must not double-count tokens
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 tail1"), (2, "w1 w2 w3 w4 tail2")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in span_dedup_stats(df, window=2, min_count=2).collect()
    }
    # duplicated 2-gram windows at pos 0..2 ("w1 w2","w2 w3","w3 w4"):
    # union covers tokens 0..4 -> 4 tokens
    assert got[1] == (3, 4) and got[2] == (3, 4)


def test_dedup_clustered_vs_greedy_hub_case(spark):
    """Pairs (1,9) and (5,9): greedy keeps BOTH 1 and 5 (only 9 is ever
    the larger side); cluster-exact keeps only the component min, 1."""
    from dataingestion_spark.operators.dedup import dedup_clustered, dedup_near

    # texts engineered so LSH pairs are exactly {1-9, 5-9}: docs 1 and 5
    # are each near-identical to hub 9 but only weakly like each other?
    # With 3-gram shingles that is hard to stage reliably, so drive the
    # semantics at the clustering layer instead via duplicate_clusters,
    # and here just verify dedup_clustered end-to-end on identical docs.
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (5, "alpha beta gamma delta epsilon zeta eta theta"),
            (9, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight nine"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    kept_c = sorted(
        r["doc_id"]
        for r in dedup_clustered(df, n=3, num_hashes=8, num_bands=4,
                                 threshold=0.5).collect()
    )
    kept_g = sorted(
        r["doc_id"]
        for r in dedup_near(df, n=3, num_hashes=8, num_bands=4,
                            threshold=0.5).collect()
    )
    # identical triple: both rules keep min id 1; null-text and unique
    # docs pass through
    assert kept_c == [1, 3, 4] and kept_g == [1, 3, 4]


def test_dedup_clustered_hub_semantics_via_cluster_layer(spark):
    """The hub case at the clustering layer: component {1,5,9} keeps only
    1 even though pair (1,5) was never verified."""
    from dataingestion_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame([(1, 9), (5, 9)], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 5: 1, 9: 1}
    survivors = [k for k, v in got.items() if k == v]
    assert survivors == [1]
