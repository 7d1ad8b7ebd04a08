"""Deduplication operators for training-data pipelines: exact, MinHash-LSH,
SimHash, and n-gram Jaccard near-dup.

Design for 100 TB scale:

  * exact: hash-groupBy on a 128-bit content fingerprint - one shuffle with
    map-side partial aggregation; winner = min doc_id (deterministic).
  * MinHash+LSH: shingle -> P permutation-min signatures -> band -> bucket
    equi-join. The candidate join is on (band_idx, band_hash) - tiny keys,
    no O(n^2) pair blow-up; only within-bucket pairs are verified. All hash
    functions are md5-based so the DuckDB oracle reproduces the exact
    signatures (no engine-private hash like xxhash64 in any result).
  * SimHash: 64-bit weighted-bit fingerprint; near-dups = equal fingerprint
    band prefixes. Bit arithmetic via md5-derived nibbles - portable.
  * n-gram Jaccard: exact verify step - explode shingles, semi-join the
    candidate pairs, |A∩B| / |A∪B| via distinct-count aggregation.

Everything is DataFrame ops (explode / groupBy / join); per-row Python
never appears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataingestion_spark.operators.parallel import fan_out


def _norm_text(col: str) -> Column:
    return F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical (normalized) documents: one row per
    duplicated fingerprint with the kept (min-id) doc and group size."""
    fp = df.select(
        F.col(id_col), F.md5(_norm_text(text_col)).alias("fp")
    ).filter(F.col(text_col).isNotNull())
    return (
        fp.groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: keep the min-id representative of each fingerprint
    group (rows with null text are kept as-is)."""
    with_fp = df.withColumn("_fp", F.md5(_norm_text(text_col)))
    keep = (
        with_fp.filter(F.col(text_col).isNotNull())
        .groupBy("_fp")
        .agg(F.min(id_col).alias("_keep"))
    )
    kept = (
        with_fp.join(keep, "_fp", "left")
        .filter(F.col(text_col).isNull() | (F.col(id_col) == F.col("_keep")))
        .drop("_fp", "_keep")
    )
    return kept


def shingles_expr(text_col: str, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct) of normalized text. Portable:
    Spark transform/sequence <-> DuckDB list comprehension."""
    toks = F.split(_norm_text(text_col), " ")
    # guard: sequence(1, 0) would count DOWN in Spark - short docs must
    # yield an empty shingle set, not a broken slice
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )


def shingled(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) exploded pairs - the base relation for MinHash and
    Jaccard. Documents shorter than n words produce no rows.

    fan_out guards scan parallelism: a one-file corpus otherwise runs the
    whole shingle+hash pipeline on one core (see operators/parallel.py;
    no-op at production file counts)."""
    return (
        fan_out(df.filter(F.col(text_col).isNotNull()))
        .select(F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("shingle"))
    )


def minhash_signatures(
    shingle_df: DataFrame, id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """P md5-permutation minima per document -> signature array.

    min(md5(i || ':' || shingle)) is a valid permutation-min because md5 is
    (for this purpose) a random permutation of the shingle universe per
    seed i; lexicographic min over hex strings is engine-portable."""
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = shingle_df.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def banded_signatures(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 4,
) -> DataFrame:
    """Split each signature into ``num_bands`` equal bands and hash each
    band: (id, band_idx, band_hash) - the LSH band relation. This is both
    the join key of candidate generation and the row format of the
    persistent band INDEX (lake/sync.py sync_band_index)."""
    return signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.md5(
                    F.array_join(
                        F.slice(
                            F.col("signature"),
                            b * (F.size(F.col("signature")) / num_bands).cast("int") + 1,
                            (F.size(F.col("signature")) / num_bands).cast("int"),
                        ),
                        "|",
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )


def band_relation(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
) -> DataFrame:
    """Corpus -> LSH band relation (id, band_idx, band_hash): shingle,
    minhash, band. Every doc contributes exactly 0 rows (null/short text
    yields no shingles) or ``num_bands`` rows - the invariant the
    incremental index maintenance relies on."""
    sigs = minhash_signatures(shingled(df, id_col, text_col, n), id_col, num_hashes)
    return banded_signatures(sigs, id_col, num_bands)


def lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 4,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (a < b) that share at
    least one band bucket. The join key is (band_idx, band_hash): shuffle
    volume is O(docs x bands), never O(pairs)."""
    banded = banded_signatures(signatures, id_col, num_bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    shingle_df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs:
    |A∩B| / (|A| + |B| - |A∩B|) via one intersection aggregate plus a
    broadcast-able per-doc size table."""
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = shingle_df.withColumnRenamed(id_col, "id_a")
    sb = shingle_df.withColumnRenamed(id_col, "id_b")
    # join the second side on (id_b, shingle) so only intersection rows
    # materialize — an id_b-only join would cross-expand to |A|x|B| rows
    # per candidate pair before filtering
    inter = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "n_a")
    nb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "n_b")
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> sign -> band ->
    candidate join -> exact Jaccard verify. Returns (id_a, id_b, jaccard).

    The shingle relation feeds both the signature and the verify stages;
    recomputing it (explode of a codegen'd column expression) is cheaper
    than persisting it for the lifetime of the caller - a persist here would
    pin executor storage memory with no unpersist point, since the result
    is returned lazily."""
    sh = shingled(df, id_col, text_col, n)
    sigs = minhash_signatures(sh, id_col, num_hashes)
    cands = lsh_candidates(sigs, id_col, num_bands)
    out = jaccard_pairs(sh, cands, id_col, threshold)
    return out


def dedup_near(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate FILTERING: drop every document that is a verified
    near-duplicate of a lower-id document; keep the rest (null-text rows
    pass through untouched).

    Greedy min-id survivor rule: a doc survives unless some pair
    (a < b, jaccard >= threshold) names it as ``b``. Unlike
    connected-component clustering this needs no iteration - one
    anti-join against the pair list. The trade, stated precisely: on a
    transitive chain (a-b near, b-c near, a-c not near) the drop list is
    {b, c}, so only ``a`` survives - ``c`` is dropped even though its only
    near-duplicate ``b`` was itself dropped. The greedy rule may therefore
    drop docs that are NOT near-duplicates of any surviving doc (it
    over-drops chains rather than over-keeping); recovering ``c`` would
    need iterative clustering, which web-scale near-dedup pipelines skip
    for exactly this one-pass property. Scale = the MinHash-LSH pipeline's
    (banded candidates, no all-pairs) plus one broadcast-able anti-join on
    the drop list."""
    pairs = minhash_near_duplicates(
        df, id_col, text_col, n, num_hashes, num_bands, threshold
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Group verified near-duplicate pairs into duplicate CLUSTERS:
    connected components of the pair graph, labeled by each component's
    minimum doc id. Returns (doc_id, cluster_id) for every doc that
    appears in at least one pair (isolated docs are their own trivial
    cluster and are omitted - the caller left-joins and coalesces to
    doc_id if it wants total coverage).

    Compared to ``dedup_near``'s one-pass greedy rule, clustering is the
    exact transitive closure: on a chain a-b, b-c the cluster is
    {a, b, c} with representative a, so keep-one-per-cluster never drops
    a doc whose only near-dup was itself dropped.

    Algorithm: iterative min-label propagation. label(x) starts as x;
    each round every node takes the min of its own label and its
    neighbors' labels; stop when a round changes nothing. Rounds needed =
    the graph diameter, and near-dup components in web corpora are
    template cliques with tiny diameters (pairs come from shared LSH
    bands, which transitively chain only through heavy shingle overlap) -
    2-4 rounds in practice. Each round is ONE shuffle: an equi-join of
    the label relation to the (pre-partitioned) edge list plus a
    combinable min-aggregate; the convergence probe piggybacks on the
    same pass as a count of changed labels (O(1) driver data). Labels are
    localCheckpoint'd per round so the plan tree stays flat instead of
    growing linearly with iterations - without this, 10 rounds of lineage
    would blow analysis time and executor stack depth long before data
    size matters. For adversarial long-chain graphs (not the near-dup
    regime) the O(log n)-round alternating-star contraction of Kiveris
    et al., "Connected Components in MapReduce and Beyond" (public),
    would replace the loop body; the per-round join shape is the same.
    """
    # Undirected edge list, pre-partitioned once on src so every round's
    # label->edge join reuses the same layout instead of reshuffling edges.
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lab", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lab").alias("nbr_lab"))
        )
        nxt = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("lab"), F.coalesce("nbr_lab", "lab")).alias("lab"),
                (F.coalesce("nbr_lab", "lab") < F.col("lab")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.where(F.col("_chg")).count()
        labels = nxt.drop("_chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iter} rounds; "
            "the pair graph has a longer chain than the near-dup regime "
            "produces - raise max_iter or switch to star contraction"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("lab").alias("cluster_id"))


def dedup_clustered(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    num_bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Cluster-exact near-duplicate filtering: keep exactly ONE
    representative (the min id) per duplicate CLUSTER (connected
    component of the verified pair graph); docs in no pair pass through,
    as do null-text rows.

    Where it differs from ``dedup_near``'s one-pass greedy rule: members
    connected only through a larger hub. Pairs (1,9) and (5,9) - greedy
    drops only 9 (the only id ever named as the larger side) and KEEPS
    both 1 and 5, two docs that are near-duplicates of the same content;
    clustering puts {1,5,9} in one component and keeps only 1. The cost
    of exactness is the label-propagation rounds of
    :func:`duplicate_clusters` - bounded by component diameter, 2-4 for
    near-dup template cliques."""
    pairs = minhash_near_duplicates(
        df, id_col, text_col, n, num_hashes, num_bands, threshold
    )
    clusters = duplicate_clusters(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    n: int = 2,
) -> DataFrame:
    """SimHash fingerprint: per shingle derive `bits` pseudo-random bits
    from md5 nibbles; fingerprint bit b = 1 iff sum over shingles of
    (bit_b ? +1 : -1) > 0. Near-dup docs differ in few bits.

    Implemented as explode + aggregate of a bit-count vector (array of
    ints) - one shuffle, map-side combinable."""
    sh = shingled(df, id_col, text_col, n)

    # bit b of md5(shingle): nibble floor(b/4) of the hex string, bit (b%4).
    # Extracted arithmetically (floor(nibble / 2^(b%4)) % 2) because
    # shiftleft needs a literal shift amount.
    def _nibble(b):
        return F.conv(
            F.substring(F.md5(F.col("shingle")), (b / F.lit(4)).cast("int") + 1, 1),
            16,
            10,
        ).cast("int")

    _pow4 = F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8))
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.when(
            F.pmod(
                F.floor(_nibble(b) / F.element_at(_pow4, (b % 4).cast("int") + 1)), 2
            )
            == 1,
            1,
        ).otherwise(-1),
    )
    votes = sh.select(F.col(id_col), bit_votes.alias("votes"))
    summed = votes.groupBy(id_col).agg(
        F.array(
            *[F.sum(F.element_at("votes", i + 1)).alias(f"b{i}") for i in range(bits)]
        ).alias("sums")
    )
    fp = summed.select(
        F.col(id_col),
        F.aggregate(
            F.zip_with(
                F.col("sums"),
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda s, i: F.when(
                    s > 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("simhash"),
    )
    return fp


# ---------------------------------------------------------------------------
# substring-level duplicate spans (token-window hashing)
# ---------------------------------------------------------------------------


def duplicate_spans(
    df: DataFrame,
    window: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level duplicate detection: every length-``window`` token
    run that occurs at least ``min_count`` times across the corpus
    (including repeats inside one document) is a duplicated span. Returns
    (id, pos, span_hash) - one row per duplicated window occurrence, pos
    = 0-based start token index.

    This is the scalable approximation of exact suffix-array substring
    dedup (the public "Deduplicating Training Data Makes Language Models
    Better" recipe, Lee et al. 2021): a duplicated substring of length
    >= window contains a duplicated window at every offset, so
    window-hashing finds exactly the substrings suffix arrays would, at
    granularity ``window`` - and it is embarrassingly parallel where a
    distributed suffix array is not. Cost: explode is O(total tokens)
    rows (each token starts one window); the hash count is one
    map-side-combinable aggregate on a 128-bit key; the occurrence join
    is an equi-join on the same key. Nothing is quadratic and no raw text
    crosses the shuffle - windows travel as md5 hex (the portable,
    oracle-reproducible choice)."""
    from dataingestion_spark.operators.text import tokens_expr

    # fan_out guards scan parallelism: window-hashing is the CPU-dense
    # step (window x md5 per token position) and a one-file corpus
    # otherwise runs it on a single core.
    df = fan_out(df)
    toks = F.when(F.col(text_col).isNull(), F.array().cast("array<string>")).otherwise(
        tokens_expr(text_col)
    )
    wins = df.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size(toks) < window, F.array().cast("array<string>")
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (window - 1)),
                    lambda i: F.md5(F.array_join(F.slice(toks, i, window), " ")),
                )
            )
        ).alias("pos", "span_hash"),
    )
    dup = (
        wins.groupBy("span_hash")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
    )
    return wins.join(dup.select("span_hash"), "span_hash").select(
        id_col, "pos", "span_hash"
    )


def span_dedup_stats(
    df: DataFrame,
    window: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-substring statistics: number of duplicated
    windows, number of TOKENS covered by at least one duplicated window
    (exact interval union), and the covered fraction. The fraction is the
    dedup gate's input - a doc that is mostly duplicated substrings gets
    dropped or trimmed.

    Interval union without an interval tree: all spans have equal length,
    so ends are monotone in starts, and a span sorted after its
    predecessor contributes min(window, pos - prev_pos) new tokens - one
    lag over a per-doc sort, exact integer arithmetic, one rounded
    division at the end (cross-engine deterministic)."""
    from pyspark.sql import Window as W

    spans = duplicate_spans(df, window, min_count, id_col, text_col)
    w = W.partitionBy(id_col).orderBy("pos")
    contrib = spans.withColumn(
        "new_toks",
        F.least(
            F.lit(window),
            F.coalesce(F.col("pos") - F.lag("pos").over(w), F.lit(window)),
        ),
    )
    per_doc = contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum("new_toks").cast("long").alias("dup_tokens"),
    )
    from dataingestion_spark.operators.text import tokens_expr

    toks = F.when(F.col(text_col).isNull(), F.array().cast("array<string>")).otherwise(
        tokens_expr(text_col)
    )
    # the base side re-tokenizes every doc - same parallelism guard
    base = fan_out(df).select(
        F.col(id_col), F.size(toks).cast("long").alias("n_tokens")
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )
