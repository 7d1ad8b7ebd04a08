"""Similarity-search tests on the driver-provided embeddings table plus
synthetic sanity cases: brute-force exactness vs numpy, LSH candidate
restriction, embedding near-dup detection."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataingestion_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    embedding_near_duplicates,
    ivf_centroids,
    ivf_topk,
    lsh_topk,
    sign_bucket_expr,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df.persist()
    yield df
    df.unpersist()


def test_brute_force_matches_numpy(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(embeddings, queries, k=5).toPandas()

    pdf = embeddings.toPandas()
    mat = np.stack(pdf["embedding"].map(np.asarray, na_action=None).values).astype(
        np.float64
    )
    ids = pdf["vec_id"].values
    for qid in [0, 1, 2]:
        qv = mat[ids == qid][0]
        scores = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
        order = sorted(
            [(round(s, 6), i) for s, i in zip(scores, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        want_ids = [i for _, i in order]
        got_q = got[got["query_id"] == qid].sort_values("rank")
        assert list(got_q["vec_id"]) == want_ids, f"query {qid}"


def test_lsh_topk_respects_buckets(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = lsh_topk(embeddings, queries, k=3, n_planes=4).toPandas()
    assert not got.empty
    # every returned neighbor shares the query's sign bucket
    b = embeddings.select(
        "vec_id", sign_bucket_expr("embedding", 4).alias("bucket")
    ).toPandas().set_index("vec_id")["bucket"]
    for r in got.itertuples(index=False):
        assert b[r.query_id] == b[r.vec_id]
    assert (got.groupby("query_id")["rank"].min() == 1).all()


def test_ivf_full_probe_equals_brute_force(spark, embeddings):
    """Probing every cell makes IVF exact: identical to brute-force top-k
    (the recall/latency knob's boundary case)."""
    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(embeddings, queries, k=5).toPandas()
    ivf = ivf_topk(
        embeddings, queries, k=5, n_centroids=8, n_probe=8
    ).toPandas()
    cols = ["query_id", "rank", "vec_id", "score"]
    assert (
        ivf.sort_values(["query_id", "rank"]).reset_index(drop=True)[cols]
        .equals(exact.sort_values(["query_id", "rank"]).reset_index(drop=True)[cols])
    )


def test_ivf_partitions_corpus_and_refines(spark, embeddings):
    cents = ivf_centroids(embeddings, n_centroids=8, refine_iters=1)
    cp = cents.toPandas()
    assert sorted(cp["cell"]) == list(range(8))
    dim = len(cp["centroid"].iloc[0])
    assert all(len(c) == dim for c in cp["centroid"])
    assigned = assign_cells(embeddings, cents).toPandas()
    # every corpus vector lands in exactly one cell
    assert len(assigned) == embeddings.count()
    assert set(assigned["cell"]).issubset(set(range(8)))


def test_ivf_probe_restriction_returns_ranked_neighbors(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_topk(embeddings, queries, k=3, n_centroids=8, n_probe=2).toPandas()
    assert not got.empty
    assert (got.groupby("query_id")["rank"].min() == 1).all()
    assert (got.groupby("query_id")["rank"].max() <= 3).all()


def test_embedding_near_duplicates_finds_planted_pair(spark):
    rows = [
        (0, [1.0, 0.0, 0.5, 0.2, 0.9, 0.1, 0.3, 0.7]),
        (1, [1.0, 0.001, 0.5, 0.2, 0.9, 0.1, 0.3, 0.7]),  # near-identical to 0
        (2, [-1.0, 0.4, -0.5, 0.8, -0.9, 0.6, -0.3, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_duplicates(df, threshold=0.99, n_planes=4).toPandas()
    assert [(r.id_a, r.id_b) for r in pairs.itertuples(index=False)] == [(0, 1)]


def test_embedding_near_dup_auto_planes_scale_with_corpus(spark):
    """n_planes=None sizes the bucket space from the corpus: bigger corpus
    -> more planes -> bounded expected bucket width."""
    import pyspark.sql.functions as F

    def mk(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: F.sin((F.col("id") + 1) * i.cast("double")),
            ).alias("embedding"),
        )

    # operator still runs and respects the dimension cap (16 dims -> <=8 planes)
    out = embedding_near_duplicates(
        mk(512), threshold=0.999, n_planes=None, target_bucket_rows=4
    )
    out.count()  # executes; auto planes = min(ceil(log2(512/4)) = 7, 8)


def test_embedding_near_dup_width_guard_splits_hot_bucket(spark):
    """A skewed corpus that collapses into ONE level-1 sign bucket must be
    re-split by the width guard's second plane family so no join bucket
    exceeds the target width (no quadratic straggler)."""
    import pyspark.sql.functions as F
    from dataingestion_spark.operators.similarity import sign_bucket_expr

    n, n_planes, target = 400, 4, 50
    # coords 1..8 fixed (all rows share the level-1 bucket for 4 planes);
    # coords 9..16 vary per row so the offset-4 refinement family splits
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.concat(
            F.array(*[F.lit(float(9 - i)) for i in range(8)]),
            F.transform(
                F.sequence(F.lit(1), F.lit(8)),
                lambda i: F.sin((F.col("id") + 1) * i.cast("double")),
            ),
        ).alias("embedding"),
    )
    lvl1 = corpus.select(
        sign_bucket_expr("embedding", n_planes).alias("b")
    ).distinct()
    assert lvl1.count() == 1, "fixture must collapse to one hot bucket"

    # mirror the operator's final join key and assert bounded width
    sub_planes = min(6, (16 - n_planes) // 2)
    keyed = corpus.select(
        sign_bucket_expr("embedding", n_planes).alias("b"),
        sign_bucket_expr("embedding", sub_planes, offset=n_planes).alias("s"),
    )
    widths = keyed.groupBy("b", "s").count().toPandas()["count"]
    assert widths.max() < n, "refinement must split the hot bucket"

    # the operator itself runs the guarded join and still finds true pairs
    # within a sub-bucket (identical rows planted)
    planted = spark.createDataFrame(
        [(10_000, [1.0] * 16), (10_001, [1.0] * 16)],
        "vec_id long, embedding array<double>",
    )
    out = embedding_near_duplicates(
        corpus.unionByName(planted),
        threshold=0.999,
        n_planes=n_planes,
        target_bucket_rows=target,
        refine_planes=6,
    ).toPandas()
    assert (10_000, 10_001) in {
        (r.id_a, r.id_b) for r in out.itertuples(index=False)
    }


def test_quantize_embeddings_exact_values(spark):
    from dataingestion_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    # amax=1.0 -> scale=1/127; q = round(x*127), half away from zero
    assert out[1]["q"] == [127, -64, 32]
    assert abs(out[1]["scale"] - 1.0 / 127) < 1e-15
    # zero vector: scale 1.0 (no divide-by-zero), q all zeros
    assert out[2]["q"] == [0, 0, 0] and out[2]["scale"] == 1.0


def test_quantize_dequantize_error_bound(spark):
    from dataingestion_spark.operators.similarity import quantize_embeddings
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, [((i * 37 + j * 13) % 200 - 100) / 100.0 for j in range(16)])
         for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    q = quantize_embeddings(df)
    joined = df.join(q, "vec_id")
    max_err = joined.select(
        F.array_max(
            F.zip_with(
                F.col("embedding"),
                F.col("q"),
                lambda x, qv: F.abs(x - qv * F.col("scale")),
            )
        ).alias("e")
    ).agg(F.max("e")).collect()[0][0]
    max_scale = q.agg(F.max("scale")).collect()[0][0]
    assert max_err <= max_scale / 2 + 1e-12


def test_quantized_topk_matches_float_ranking_when_separable(spark):
    from dataingestion_spark.operators.similarity import (
        brute_force_topk,
        quantized_topk,
    )

    # well-separated directions: int8 rounding cannot flip the ranking
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.95, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    f = [(r["rank"], r["vec_id"]) for r in brute_force_topk(df, q, k=3).collect()]
    g = [(r["rank"], r["vec_id"]) for r in quantized_topk(df, q, k=3).collect()]
    assert [x[1] for x in f] == [x[1] for x in g] == [1, 2, 3]
