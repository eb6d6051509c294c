"""Deterministic power iteration over the embedding corpus — the
spectral primitive (top principal direction) an embedding pipeline runs
for mean/dominant-direction removal (ABTT, Mu & Viswanath 2018), PCA
whitening, or drift monitoring of the embedding space.

Plan shape (the point of the formulation): the d×d covariance matrix is
NEVER materialized — each iteration is two corpus passes,

    s  = ⟨x, v⟩            per row (narrow fold over the broadcast
                            1-row direction, codegen, no shuffle)
    w  = Σ_rows x · s       one (pos, x·s) hash-aggregate, dim×N rows
                            with map-side partials

so cost is O(N·d) per iteration at any scale, the same layout as
``clustering._update``. With the corpus mean at ~0 (the synthetic
embeddings; center first otherwise) w converges to the top eigenvector
of XᵀX.

Determinism contract (mirrors operators/clustering.py): projections are
rounded to 6 dp BEFORE the weighted sum, per-dimension sums are
DECIMAL-exact (order-independent), and the renormalized direction is
rounded to 6 dp — every step replayable by a SQL engine, so the
unrolled-CTE oracle agrees hash-for-hash. Init = the smallest-id vector
normalized (no RNG). Sign is therefore pinned by the init, not
arbitrary as in textbook power iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_dot(a: Column, b: Column, decimals: int = 6) -> Column:
    """⟨a, b⟩ as a sequential elementwise fold (same evaluation order as
    the oracle's list_transform + list_sum), rounded."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        ),
        decimals,
    )


def _normalize(ws: Column, decimals: int = 6) -> Column:
    """ws / ||ws|| with the squared-norm folded in list order, each
    element rounded — identical expression both engines."""
    norm = F.sqrt(F.aggregate(ws, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(ws, lambda x: F.round(x / norm, decimals))


def _iterate(t: DataFrame, v: DataFrame) -> DataFrame:
    """One power-iteration step: (1-row v) → (1-row v')."""
    s = t.crossJoin(F.broadcast(v)).select(
        "vid", "vec", _fold_dot(F.col("vec"), F.col("pc")).alias("s")
    )
    w = (
        s.select("s", F.posexplode("vec").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.sum((F.col("x") * F.col("s")).cast("decimal(28,12)")).cast("double").alias("w"))
    )
    return w.agg(F.array_sort(F.collect_list(F.struct("pos", "w"))).alias("arr")).select(
        _normalize(F.transform("arr", lambda st: st["w"])).alias("pc")
    )


def _power_direction(df: DataFrame, id_col: str, vec_col: str, iters: int) -> DataFrame:
    from is3107datapipelineproject_spark.operators.dedup import spread_small_input

    t = spread_small_input(df).select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    v = (
        t.orderBy("vid")
        .limit(1)
        .select(_normalize(F.col("vec")).alias("pc"))
        .coalesce(1)
        .localCheckpoint(eager=False)
    )
    for _ in range(iters):
        # 1-row frames: checkpoint keeps the lineage O(1) and the corpus
        # scan count exactly iters (+1 for any consumer) — the iterative
        # discipline shared with kmeans_assign / pagerank.
        v = _iterate(t, v).coalesce(1).localCheckpoint(eager=False)
    return v


def top_principal_component(
    df: DataFrame, id_col: str, vec_col: str, iters: int = 3
) -> DataFrame:
    """``iters`` power-iteration steps from the smallest-id vector;
    returns the direction as ``(dim, loading)`` rows (dim 0-based)."""
    v = _power_direction(df, id_col, vec_col, iters)
    return v.select(F.posexplode("pc").alias("dim", "loading")).select(
        F.col("dim").cast("int").alias("dim"), "loading"
    )


def abtt_postprocess(
    df: DataFrame, id_col: str, vec_col: str, iters: int = 3
) -> DataFrame:
    """All-but-the-top (Mu & Viswanath 2018) dominant-direction removal:
    r = x − ⟨x, v⟩·v against the power-iteration direction. Emits the
    per-vector summary ``(id_col, resid_norm, resid_d0)`` (norm and
    first residual coordinate, 4 dp) rather than d new columns — the
    audit columns a drift monitor tracks; the full residual vector is
    the same expression un-summarized. One narrow corpus pass with the
    1-row direction broadcast."""
    v = _power_direction(df, id_col, vec_col, iters)
    t = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    s = _fold_dot(F.col("vec"), F.col("pc"))
    resid = F.zip_with(F.col("vec"), F.col("pc"), lambda x, p: x - s * p)
    return (
        t.crossJoin(F.broadcast(v))
        .select(
            F.col("vid").alias(id_col),
            F.round(F.sqrt(F.aggregate(resid, F.lit(0.0), lambda a, x: a + x * x)), 4).alias(
                "resid_norm"
            ),
            F.round(resid.getItem(0), 4).alias("resid_d0"),
        )
    )


def pc_projection(
    df: DataFrame, id_col: str, vec_col: str, iters: int = 3
) -> DataFrame:
    """Per-vector projection onto the converged direction — the score
    ABTT subtracts and outlier sweeps rank by. One extra narrow pass
    over the corpus with the 1-row direction broadcast; returns
    ``(id_col, proj)`` with proj rounded to 4 dp."""
    v = _power_direction(df, id_col, vec_col, iters)
    t = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    return (
        t.crossJoin(F.broadcast(v))
        .select("vid", _fold_dot(F.col("vec"), F.col("pc"), decimals=4).alias("proj"))
        .select(F.col("vid").alias(id_col), "proj")
    )
