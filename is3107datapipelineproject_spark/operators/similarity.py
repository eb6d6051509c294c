"""Embedding-similarity operators: brute-force cosine top-k and the
bucketed (IVF-style) scale path.

Beyond-reference surface (driver mandate): ANN over an
``array<float>`` embedding column. Two tiers:

- ``cosine_topk``: exact brute force — broadcast the (small) query set
  against the full corpus, JVM-side ``zip_with``/``aggregate`` dot
  products, per-query window top-k. Correctness baseline; cost is
  O(|Q| × corpus) with NO shuffle of the corpus (queries broadcast,
  top-k partial-aggregates per partition before the final window).
- ``cosine_topk_bucketed``: IVF-style — restrict the search to the
  query's coarse bucket (here the precomputed cluster/label column; in
  production the argmin-centroid assignment computed the same narrow
  way). The corpus shuffles once on the bucket key; each query scans
  only its bucket — the 100 TB plan where a full scan per query is
  impossible. Recall < 1.0 by construction (standard IVF tradeoff;
  probe multiple buckets to trade cost for recall).

Determinism contract: cosine is computed in float64 and ROUNDED to 4
decimals before ranking; ranking orders by (rounded sim DESC, id ASC).
Rounding first makes the rank reproducible across engines whose fp
summation order differs (Spark's fold vs an oracle's list_sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns (stays in
    whole-stage codegen; no UDF, no explode)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _prep(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    extra: list[str] | None = None,
    spread: bool = False,
) -> DataFrame:
    """Cast to double and precompute the norm once (narrow). ``spread``
    (corpus sides only): the per-row dot-product folds are CPU-bound, so
    an under-partitioned scan must not serialize them on one task —
    no-op when the input already has >= cores partitions."""
    if spread:
        from is3107datapipelineproject_spark.operators.dedup import spread_small_input

        df = spread_small_input(df)
    v = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col).alias("vid"), v.alias("vec"), l2_norm(v).alias("norm")]
    for e in extra or []:
        cols.append(F.col(e))
    return df.select(*cols)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    max_broadcast_queries: int = 100_000,
) -> DataFrame:
    """Exact cosine top-k: for every query vector, the k nearest corpus
    vectors (self-matches excluded). Returns
    ``(query_id, neighbor_id, rank, cosine)`` with cosine rounded to 4.

    Plan shape: broadcast(queries) × corpus scan → narrow cosine →
    window top-k partitioned by query. The corpus is never shuffled; the
    only exchange is the final rank partition on query_id (|Q| keys).

    The exact tier's contract is a SMALL query set: the query side is
    broadcast whole to every executor, so a huge query frame would OOM
    the cluster, not just run slow. ``max_broadcast_queries`` enforces
    the contract with a cheap count (columnar count-only scan) and
    raises toward the scale tiers (``cosine_topk_bucketed`` /
    ``ivf_topk``) instead of silently degrading exact→approximate.
    """
    n_q = queries.count()
    if n_q > max_broadcast_queries:
        raise ValueError(
            f"cosine_topk broadcasts the query side; got {n_q} query vectors "
            f"(> max_broadcast_queries={max_broadcast_queries}). Use ivf_topk or "
            "cosine_topk_bucketed for large query sets, or raise the limit "
            "explicitly if the executors can hold the broadcast."
        )
    c = _prep(corpus, id_col, vec_col, spread=True)
    q = _prep(queries, id_col, vec_col).select(
        F.col("vid").alias("qid"), F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    sim = F.round(
        dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
    ).alias("cosine")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vid") != F.col("qid"))
        .select(F.col("qid").alias("query_id"), F.col("vid").alias("neighbor_id"), sim)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    k: int = 5,
) -> DataFrame:
    """IVF-style bucketed top-k: neighbors are searched ONLY within the
    query's coarse bucket (cluster assignment). Same output contract as
    ``cosine_topk`` plus the bucket — the scale path where per-query
    work is |bucket|, not |corpus|.
    """
    c = _prep(corpus, id_col, vec_col, [bucket_col], spread=True).withColumnRenamed(bucket_col, "bucket")
    q = (
        _prep(queries, id_col, vec_col, [bucket_col])
        .select(
            F.col("vid").alias("qid"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
            F.col(bucket_col).alias("bucket"),
        )
    )
    sim = F.round(
        dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
    ).alias("cosine")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vid") != F.col("qid"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("bucket"),
            F.col("vid").alias("neighbor_id"),
            sim,
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def bucket_centroids(
    df: DataFrame,
    vec_col: str,
    bucket_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-bucket mean vector — the IVF coarse codebook (and the
    "label centroid" embedding aggregate). Returns
    ``(bucket, centroid: array<double>)``.

    Determinism: components are summed as DECIMAL (exact, order-
    independent), divided as double, rounded to ``decimals`` — so Spark,
    any SQL oracle, and any partitioning agree bit-for-bit. Plan:
    posexplode → one hash-aggregate on (bucket, position) → reassemble
    the ordered array per bucket. Shuffle volume is dim × corpus rows of
    (bucket, pos, x) triples — the transpose-friendly layout that
    partial-aggregates map-side; buckets × dim is tiny output."""
    t = df.select(
        F.col(bucket_col).alias("bucket"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
    )
    per = t.groupBy("bucket", "pos").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1)),
            decimals,
        ).alias("c")
    )
    return per.groupBy("bucket").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    probes: int = 2,
    k: int = 5,
) -> DataFrame:
    """IVF multi-probe ANN: each query searches its ``probes`` nearest
    coarse buckets (by cosine to the bucket centroid), not just its own
    — the recall knob of a real IVF index. Returns
    ``(query_id, neighbor_id, cosine, rank)``.

    Plan: centroids are buckets × dim (tiny) → broadcast against the
    query set → window top-``probes`` picks each query's probe list →
    the (query, bucket) probe pairs broadcast-join the corpus on the
    bucket key → narrow cosine → per-query top-k. The corpus is scanned
    once and only probed buckets are read when the corpus is
    partitioned by bucket (partition pruning does the skipping at
    100 TB); per-query candidate cost is ``probes × avg bucket size``,
    never |corpus|."""
    cents = bucket_centroids(corpus, vec_col, bucket_col)
    q = _prep(queries, id_col, vec_col).select(
        F.col("vid").alias("qid"), F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    csim = F.round(
        dot(F.col("centroid"), F.col("qvec"))
        / (l2_norm(F.col("centroid")) * F.col("qnorm")),
        4,
    ).alias("csim")
    wp = Window.partitionBy("qid").orderBy(F.col("csim").desc(), F.col("bucket"))
    probe = (
        q.crossJoin(F.broadcast(cents))
        .select("qid", "qvec", "qnorm", "bucket", csim)
        .withColumn("prank", F.row_number().over(wp))
        .filter(F.col("prank") <= probes)
        .select("qid", "qvec", "qnorm", "bucket")
    )
    c = _prep(corpus, id_col, vec_col, [bucket_col], spread=True).withColumnRenamed(bucket_col, "bucket")
    sim = F.round(
        dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
    ).alias("cosine")
    scored = (
        c.join(F.broadcast(probe), "bucket")
        .filter(F.col("vid") != F.col("qid"))
        .select(F.col("qid").alias("query_id"), F.col("vid").alias("neighbor_id"), sim)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    probes_list: tuple[int, ...] = (1, 2, 4),
    k: int = 5,
) -> DataFrame:
    """Every sweep point of an IVF ``probes`` tuning curve from ONE
    scoring pass (r13, guide §2 — don't compute things twice): returns,
    for each ``p`` in ``probes_list``, exactly the rows
    ``ivf_topk(..., probes=p, k=k)`` would return, tagged with a
    ``probes`` column.

    Why it is identical per point: the probe ranking window (centroid
    cosine DESC, bucket) does not depend on the probe count, so the
    candidate set at ``p`` is precisely the rows of the ``max(probes)``
    candidate set with ``prank <= p``; and each corpus vector lives in
    ONE bucket, so filtering candidates by prank then re-ranking by
    (cosine DESC, neighbor_id) reproduces the per-point top-k
    bit-for-bit. The scored candidate frame is computed once and
    localCheckpoint'd (lazy — its first consumer, the first sweep
    point's window, scans every partition), so the sweep pays one
    centroid build, one probe ranking and one cosine pass instead of
    ``len(probes_list)`` of each."""
    pmax = max(probes_list)
    cents = bucket_centroids(corpus, vec_col, bucket_col)
    q = _prep(queries, id_col, vec_col).select(
        F.col("vid").alias("qid"), F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    csim = F.round(
        dot(F.col("centroid"), F.col("qvec"))
        / (l2_norm(F.col("centroid")) * F.col("qnorm")),
        4,
    ).alias("csim")
    wp = Window.partitionBy("qid").orderBy(F.col("csim").desc(), F.col("bucket"))
    probe = (
        q.crossJoin(F.broadcast(cents))
        .select("qid", "qvec", "qnorm", "bucket", csim)
        .withColumn("prank", F.row_number().over(wp))
        .filter(F.col("prank") <= pmax)
        .select("qid", "qvec", "qnorm", "bucket", "prank")
    )
    c = _prep(corpus, id_col, vec_col, [bucket_col], spread=True).withColumnRenamed(bucket_col, "bucket")
    sim = F.round(
        dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
    ).alias("cosine")
    scored = (
        c.join(F.broadcast(probe), "bucket")
        .filter(F.col("vid") != F.col("qid"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            sim,
            "prank",
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    out = None
    for p in probes_list:
        part = (
            scored.filter(F.col("prank") <= p)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select(
                F.lit(p).alias("probes"), "query_id", "neighbor_id", "cosine", "rank"
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 10,
) -> DataFrame:
    """k-nearest-neighbor classification: majority label among the k
    cosine-nearest corpus vectors (ties broken by smaller label).
    Returns ``(query_id, predicted_label, votes)`` — the workhorse
    quality-filter shape (label a crawl by its nearest curated
    examples). Same broadcast-scan plan as cosine_topk; the vote is one
    extra tiny aggregate."""
    c = _prep(corpus, id_col, vec_col, [label_col], spread=True).withColumnRenamed(label_col, "nlabel")
    q = _prep(queries, id_col, vec_col).select(
        F.col("vid").alias("qid"), F.col("vec").alias("qvec"), F.col("norm").alias("qnorm")
    )
    sim = F.round(
        dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
    ).alias("cosine")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vid") != F.col("qid"))
        .select(F.col("qid").alias("query_id"), F.col("vid").alias("nid"), "nlabel", sim)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nid"))
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    votes = topk.groupBy("query_id", "nlabel").agg(F.count(F.lit(1)).alias("votes"))
    wv = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("nlabel"))
    return (
        votes.withColumn("vrank", F.row_number().over(wv))
        .filter(F.col("vrank") == 1)
        .select("query_id", F.col("nlabel").alias("predicted_label"), "votes")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
    max_broadcast_queries: int = 100_000,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every query
    vector, the ``k`` most cosine-similar corpus vectors whose label
    DIFFERS from the query's own — near the anchor in embedding space
    but semantically wrong, the negatives that actually teach the
    margin. Returns ``(query_id, negative_id, cosine, rank)``.

    Same plan family as cosine_topk (queries broadcast whole, corpus
    scanned once, never shuffled; WindowGroupLimit pushes the per-query
    top-k below the rank exchange) with the label-mismatch predicate
    applied before ranking. The same small-query-set contract applies
    and is enforced the same way; the bucketed/IVF tiers are the
    fallback shape when the anchor set itself is corpus-sized.
    """
    n_q = queries.count()
    if n_q > max_broadcast_queries:
        raise ValueError(
            f"hard_negatives broadcasts the query side; got {n_q} query vectors "
            f"(> max_broadcast_queries={max_broadcast_queries}). Mine negatives "
            "bucket-wise (cosine_topk_bucketed with a label-mismatch filter) "
            "for corpus-sized anchor sets."
        )
    c = _prep(corpus, id_col, vec_col, [label_col], spread=True).withColumnRenamed(
        label_col, "nlabel"
    )
    q = _prep(queries, id_col, vec_col, [label_col]).select(
        F.col("vid").alias("qid"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
        F.col(label_col).alias("qlabel"),
    )
    sim = F.round(
        dot(F.col("vec"), F.col("qvec")) / (F.col("norm") * F.col("qnorm")), 4
    ).alias("cosine")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter((F.col("vid") != F.col("qid")) & (F.col("nlabel") != F.col("qlabel")))
        .select(F.col("qid").alias("query_id"), F.col("vid").alias("negative_id"), sim)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, bucket_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within coarse buckets:
    ``(id1, id2, cosine)`` with id1 < id2 and cosine ≥ threshold. The
    quadratic expansion is confined to each bucket (the classic
    blocked-dedup argument; note dedup.blocked_jaccard_pairs abandoned
    the raw within-block join in round 11 precisely because METADATA
    blocks grow with the corpus — embedding buckets escape that fate
    only via the granularity contract below) — BUCKET GRANULARITY MUST
    GROW WITH THE CORPUS: per-bucket work is
    O(|bucket|²), so a fixed coarse partition (the registered query's
    ~10 labels — fine at test scale) becomes quadratic at 100 TB. The
    production formulation feeds ``bucket_col`` = an IVF cell id from
    ``bucket_centroids``/``ivf_topk``'s coarse quantizer (cells sized
    ~√corpus), keeping per-bucket work bounded while recall follows the
    same cell-locality argument as the ANN tier."""
    t = _prep(df, id_col, vec_col, [bucket_col], spread=True).withColumnRenamed(bucket_col, "bucket")
    a, b = t.alias("a"), t.alias("b")
    sim = F.round(
        dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.norm") * F.col("b.norm")), 4
    ).alias("cosine")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vid") < F.col("b.vid")))
        .select(F.col("a.vid").alias("id1"), F.col("b.vid").alias("id2"), sim)
        .filter(F.col("cosine") >= threshold)
    )


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str, bits: int = 8
) -> DataFrame:
    """Symmetric scalar quantization of the embedding column to signed
    ``bits``-bit integers — the standard memory-4× (int8) compression
    step before a large ANN index is built. One corpus pass finds the
    global max-|x| (exact, order-independent — no fp tolerance needed),
    scale = maxabs / (2^(bits−1) − 1); a second narrow pass emits one
    row per (vector, dimension):

        ``(id_col, pos, q, scale)``  with q = clip(round(x / scale)).

    pos is 1-based (matches SQL ``generate_subscripts``). The
    quantized codes feed ivf_topk-style search with int arithmetic —
    at 100 TB the index shrinks from 4·d bytes/vec to d bytes/vec, and
    both passes are scan-parallel (the 1-row max attaches by broadcast
    cross join, never a driver collect)."""
    qmax = (1 << (bits - 1)) - 1
    maxabs = df.select(
        F.max(F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))).alias(
            "__maxabs"
        )
    )
    scale = F.col("__maxabs") / F.lit(float(qmax))  # exact: max is order-free, / is one op
    return (
        df.crossJoin(F.broadcast(maxabs))
        .select(
            F.col(id_col),
            F.posexplode(F.col(vec_col)).alias("__p0", "__x"),
            scale.alias("__scale"),
        )
        .select(
            id_col,
            (F.col("__p0") + 1).cast("long").alias("pos"),
            F.greatest(
                F.lit(-qmax),
                F.least(F.lit(qmax), F.round(F.col("__x").cast("double") / F.col("__scale")).cast("int")),
            ).alias("q"),
            F.round(F.col("__scale"), 6).alias("scale"),
        )
    )


def centroid_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-label embedding outliers: the ``k`` vectors of each label
    whose cosine to their OWN label centroid is lowest — the standard
    "mislabeled / off-topic sample" sweep run before a labeled corpus
    is trusted for training.

    Plan: centroids (labels × dim — tiny) broadcast back onto the
    corpus, the cosine computed as a JVM fold per row (no UDF), then a
    per-label bottom-k via row_number over (cosine asc, id asc). The
    rank filter is pushed into the shuffle by Spark 4's
    WindowGroupLimit: each map task keeps only its local bottom-k per
    label before exchanging, so the window shuffle carries
    O(labels × k × tasks) rows, not the corpus — the property that
    keeps the sweep viable when one label holds billions of vectors.

    Cosine is rounded to 4 decimals BEFORE ranking (cross-engine fp
    determinism); ties break on id. Returns
    ``(id_col, label_col, centroid_cos, rnk)``.
    """
    # Zero-norm vectors (and all-zero centroids) make the cosine NULL,
    # and NULL ordering diverges across engines (Spark ASC = NULLS
    # FIRST, DuckDB row_number = NULLS LAST) — exclude them up front so
    # a zero vector can never top the outlier ranking.
    cents = bucket_centroids(df, vec_col, label_col).filter(
        l2_norm(F.col("centroid")) > 0
    )
    corpus = _prep(df, id_col, vec_col, extra=[label_col], spread=True).filter(
        F.col("norm") > 0
    )
    scored = corpus.join(
        F.broadcast(cents), corpus[label_col] == cents["bucket"]
    ).select(
        F.col("vid"),
        F.col(label_col),
        F.round(
            dot(F.col("vec"), F.col("centroid"))
            / (F.col("norm") * l2_norm(F.col("centroid"))),
            4,
        ).alias("centroid_cos"),
    )
    w = Window.partitionBy(label_col).orderBy(
        F.col("centroid_cos").asc(), F.col("vid").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("vid").alias(id_col), label_col, "centroid_cos", "rnk")
    )
