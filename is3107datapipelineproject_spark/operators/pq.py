"""Product quantization: the memory-side scale path for ANN search.

Beyond-reference surface (driver mandate): ``quantize_embeddings``
(similarity.py) compresses scalar-wise; PQ (Jégou et al., 2011) goes
further — split each d-dim vector into ``m`` subvectors, learn a
``k``-codeword codebook per subspace, and store each vector as ``m``
small integer codes (d·4 bytes → m bytes at k ≤ 256). Search never
decompresses: an asymmetric-distance (ADC) lookup table of
query·codeword products turns scoring into ``m`` table lookups per
candidate.

Determinism contract (mirrors operators/clustering.py):
- codebook init = the subvectors of the ``k`` SMALLEST-id vectors (no
  RNG; production trains per-subspace k-means on a bounded sample and
  passes it in via ``codebook`` — the operator is agnostic),
- per-subspace assignment = argmin over squared L2 rounded to 6 dp,
  ties to the smaller code,
- ADC entries rounded to 6 dp and accumulated as DECIMAL (the m-term
  score sum is exact and order-independent), final score rounded to 4.

Plan shape at 100 TB:
- the codebook + ADC table collapse to ONE broadcast row (m·k structs);
  encode and score are per-row folds inside whole-stage codegen — the
  corpus is never shuffled, never expanded k× or m×, and the only wide
  node in ``pq_topk`` is the final TakeOrderedAndProject (per-partition
  heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DP = "decimal(18,6)"


def _sq_dist(a: Column, b: Column, decimals: int = 6) -> Column:
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        decimals,
    )


def _dot(a: Column, b: Column, decimals: int = 6) -> Column:
    return F.round(
        F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v),
        decimals,
    )


def pq_codebook(df: DataFrame, id_col: str, vec_col: str, m: int, k: int) -> DataFrame:
    """Deterministic seed codebook ``(sub, code, cw)``: subvector ``sub``
    of the ``code``-th smallest-id vector. k·m rows — bounded, built
    from a k-row limit, never corpus-sized."""
    w = Window.orderBy("__vid")
    seeds = (
        df.select(F.col(id_col).alias("__vid"), F.col(vec_col).cast("array<double>").alias("__v"))
        .orderBy("__vid")
        .limit(k)
        .select((F.row_number().over(w) - 1).cast("int").alias("code"), "__v")
    )
    sub_d = _sub_d(df, vec_col, m)
    subs = F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("sub")
    return seeds.select(subs, "code", "__v").select(
        "sub",
        "code",
        F.slice("__v", F.col("sub") * sub_d + 1, sub_d).alias("cw"),
    )


def _sub_d(df: DataFrame, vec_col: str, m: int) -> int:
    """Subvector width from the schema'd element count of the first row
    — a 1-row bounded probe (documented eager guard, kmeans-style)."""
    d = df.select(F.size(vec_col).alias("d")).first()["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    return d // m


def _packed(codebook: DataFrame, extra: list[str] | None = None) -> DataFrame:
    cols = ["sub", "code", "cw"] + (extra or [])
    return codebook.agg(
        F.array_sort(F.collect_list(F.struct(*cols))).alias("cb")
    )


def _best_code(vec: Column, sub: int, sub_d: int, dp_field: str | None = None) -> Column:
    """Per-subspace argmin fold over the broadcast codebook entries of
    this sub: returns struct(code, dp?) for the nearest codeword."""
    sv = F.slice(vec, sub * sub_d + 1, sub_d)
    cands = F.filter("cb", lambda s: s["sub"] == F.lit(sub))
    zero_fields = [
        F.lit(float("inf")).alias("d2"),
        F.lit(2**31 - 1).cast("int").alias("code"),
    ]
    if dp_field:
        zero_fields.append(F.lit(0.0).cast(_DP).alias("dp"))
    zero = F.struct(*zero_fields)

    def merge(acc: Column, c: Column) -> Column:
        d2 = _sq_dist(sv, c["cw"])
        better = (d2 < acc["d2"]) | ((d2 == acc["d2"]) & (c["code"] < acc["code"]))
        fields = [d2.alias("d2"), c["code"].alias("code")]
        if dp_field:
            fields.append(c[dp_field].alias("dp"))
        return F.when(better, F.struct(*fields)).otherwise(acc)

    return F.aggregate(cands, zero, merge)


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Encode every vector as ``m`` codes: ``(id_col, sub, code)`` long
    form (m rows per vector — the layout a code-indexed IVFADC index
    ingests). One narrow corpus pass over the broadcast codebook; the
    per-sub argmin is order-independent (strict min, ties to smaller
    code), so any fold order gives the same codes."""
    sub_d = _sub_d(df, vec_col, m)
    cb = codebook if codebook is not None else pq_codebook(df, id_col, vec_col, m, k)
    packed = _packed(cb).coalesce(1).localCheckpoint(eager=False)
    t = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    per_sub = [
        F.struct(F.lit(j).alias("sub"), _best_code(F.col("__v"), j, sub_d)["code"].alias("code"))
        for j in range(m)
    ]
    return (
        t.crossJoin(F.broadcast(packed))
        .select(F.col(id_col), F.explode(F.array(*per_sub)).alias("e"))
        .select(id_col, F.col("e.sub").cast("int").alias("sub"), F.col("e.code").alias("code"))
    )


def pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    topn: int = 20,
) -> DataFrame:
    """ADC top-``topn`` by approximate inner product against the
    smallest-id vector as query: ``(id_col, score)``.

    The ADC table (query·codeword per (sub, code), rounded to 6 dp,
    DECIMAL) rides along the broadcast codebook row; each corpus row
    folds to its per-sub nearest code and ACCUMULATES that code's table
    entry in the same fold — encode and score are one narrow pass, and
    the exact decimal sum makes the ranking replayable in SQL. Final
    cut is TakeOrderedAndProject (score desc, id asc)."""
    sub_d = _sub_d(df, vec_col, m)
    q = (
        df.orderBy(id_col)
        .limit(1)
        .select(F.col(vec_col).cast("array<double>").alias("__q"))
    )
    cb = (
        pq_codebook(df, id_col, vec_col, m, k)
        .crossJoin(F.broadcast(q))
        .select(
            "sub",
            "code",
            "cw",
            _dot(F.col("cw"), F.slice("__q", F.col("sub") * sub_d + 1, sub_d))
            .cast(_DP)
            .alias("dp"),
        )
    )
    packed = _packed(cb, extra=["dp"]).coalesce(1).localCheckpoint(eager=False)
    t = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    score = None
    for j in range(m):
        dp_j = _best_code(F.col("__v"), j, sub_d, dp_field="dp")["dp"]
        score = dp_j if score is None else score + dp_j
    return (
        t.crossJoin(F.broadcast(packed))
        .select(F.col(id_col), F.round(score.cast("double"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(topn)
    )


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k_coarse: int = 8,
    km_iters: int = 2,
    m: int = 8,
    k: int = 16,
    topn: int = 20,
) -> DataFrame:
    """IVF-PQ: the production billion-vector ANN shape — a coarse
    k-means router prunes the corpus to the query's cluster, then ADC
    scores ONLY those candidates in the compressed domain:
    ``(id_col, score)`` top-``topn`` for the smallest-id query vector.

    Composition contract: the coarse assignment is
    ``clustering.kmeans_assign`` (deterministic Lloyd), the codebook /
    ADC table come from the FULL corpus exactly as in :func:`pq_topk`
    (a production system trains both on a bounded sample; the routing
    and scoring stay unchanged), so the oracle composes the two
    existing unrolled-CTE chains verbatim.

    Scale shape: search cost = |cluster| ≈ N/k_coarse candidates
    instead of N — the probe fraction is the recall/latency knob, and
    the candidate filter is a broadcast 1-row cluster-id semi-join on
    the ASSIGNMENT (id-keyed, co-partitioned with the corpus join), so
    nothing fact-sized shuffles beyond the one id join."""
    from is3107datapipelineproject_spark.operators.clustering import kmeans_assign

    asg = kmeans_assign(df, id_col, vec_col, k=k_coarse, iters=km_iters)
    q_cluster = (
        asg.orderBy(id_col).limit(1).select(F.col("cluster").alias("__qc"))
    )
    cand_ids = (
        asg.crossJoin(F.broadcast(q_cluster))
        .filter(F.col("cluster") == F.col("__qc"))
        .select(id_col)
    )
    cands = df.join(cand_ids, id_col)

    sub_d = _sub_d(df, vec_col, m)
    q = df.orderBy(id_col).limit(1).select(F.col(vec_col).cast("array<double>").alias("__q"))
    cb = (
        pq_codebook(df, id_col, vec_col, m, k)
        .crossJoin(F.broadcast(q))
        .select(
            "sub",
            "code",
            "cw",
            _dot(F.col("cw"), F.slice("__q", F.col("sub") * sub_d + 1, sub_d))
            .cast(_DP)
            .alias("dp"),
        )
    )
    packed = _packed(cb, extra=["dp"]).coalesce(1).localCheckpoint(eager=False)
    t = cands.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    score = None
    for j in range(m):
        dp_j = _best_code(F.col("__v"), j, sub_d, dp_field="dp")["dp"]
        score = dp_j if score is None else score + dp_j
    return (
        t.crossJoin(F.broadcast(packed))
        .select(F.col(id_col), F.round(score.cast("double"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(topn)
    )


def ivfpq_topk_from_index(
    spark,
    tables: dict[str, str],
    df: DataFrame,
    id_col: str,
    vec_col: str,
    topn: int = 20,
) -> DataFrame:
    """Search a PERSISTED IVF-PQ index (plans/indexes.py::
    ivfpq_index_tables) for the smallest-id vector of ``df``: route the
    query against the stored centroids, build the ADC lookup table from
    the stored codebook, and score ONLY the stored codes of the query's
    coarse cluster — the original d-dim vectors are never scanned.

    Scale shape, and why this is the deployment path:
    - routing = one narrow fold of the 1-row query over the k-row
      centroid table (``clustering.assign_to_centroids``); collecting
      the single cluster id is a 1-row documented eager guard, and it
      buys PLANNING-time partition pruning;
    - the codes scan carries ``cluster = <literal>`` so the parquet
      source prunes to ~1/k_coarse of the files before reading a row;
    - scoring is codes ⋈ broadcast(m·k-row ADC table) + one id-keyed
      DECIMAL-exact sum — compressed-domain only, m bytes per
      candidate;
    - index build cost (k-means + encode) is paid by the build, not
      here — the amortization ivfpq_topk (which recomputes both per
      call) exists to contrast against.

    Same determinism contract as :func:`ivfpq_topk`: 6-dp ADC entries,
    DECIMAL accumulation, 4-dp rounding before the
    TakeOrderedAndProject cut — identical results, same oracle."""
    from is3107datapipelineproject_spark.operators.clustering import assign_to_centroids

    cents = spark.table(tables["centroids"])
    cb = spark.table(tables["codebook"])
    q = df.orderBy(id_col).limit(1)
    qc = assign_to_centroids(q, id_col, vec_col, cents).first()["cluster"]
    qv = q.select(F.col(vec_col).cast("array<double>").alias("__q"))
    sub_d = cb.select(F.size("cw").alias("d")).first()["d"]
    lut = cb.crossJoin(F.broadcast(qv)).select(
        "sub",
        "code",
        _dot(F.col("cw"), F.slice("__q", F.col("sub") * sub_d + 1, sub_d))
        .cast(_DP)
        .alias("dp"),
    )
    codes = spark.table(tables["codes"]).filter(F.col("cluster") == F.lit(qc))
    sc = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("dp").cast("double"), 4).alias("score"))
    )
    return sc.orderBy(F.desc("score"), F.asc(id_col)).limit(topn)
