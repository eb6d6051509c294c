"""Distributed exact ranking: ``row_number()`` over an arbitrary value
order WITHOUT a single-partition window.

The anti-pattern this replaces: ``Window.orderBy(value)`` plans as
``Exchange SinglePartition → Sort → Window`` — one task sorts the whole
frame, so the query time is the size of the frame no matter how many
executors exist. Fine for a bounded frame (daily spine, vocabulary
head); a scale-killer for anything corpus- or dimension-growing
(per-customer revenue at 100 TB is hundreds of millions of rows).

``distributed_rank`` is the value-ordered sibling of
``sampling.deterministic_shuffle``'s two-level hash rank:

1. ONE cheap pass computes approximate quantile cutoffs of the value
   column (``approxQuantile`` — t-digest style mergeable summaries, an
   aggregate, never a sort). Cutoff accuracy only affects load balance,
   never correctness.
2. Each row's bucket = number of cutoffs strictly below its value — a
   deterministic, ORDER-ALIGNED function of the value (equal values
   always share a bucket; bucket ascending ⇔ value ascending).
3. Rows rank inside their (group, bucket) in parallel —
   ``row_number()`` over a window PARTITIONED by bucket, sorting only
   ~n/n_buckets rows per task.
4. Bucket row-counts aggregate to an ``n_buckets``-row frame; a prefix
   window over THAT (bounded by construction: ≤ n_buckets rows per
   group) yields each bucket's global offset; a broadcast join adds
   offset + local rank = exact global rank.

Total cost: one aggregate pass for cutoffs + one value-bucket exchange
+ a bucket-count aggregate — every stage partial-aggregatable and
parallel. The result is EXACTLY ``row_number() OVER ([PARTITION BY
group] ORDER BY value, *tiebreaks)`` — the oracle can keep the plain
window SQL while the Spark plan scales.

``ntile_from_rank`` converts (rank, group-size) to the exact
``ntile(k)`` assignment (first ``n mod k`` tiles get ``⌈n/k⌉`` rows —
the SQL-standard fill order both Spark and DuckDB implement), so
quartile/decile scoring rides the distributed rank too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["distributed_cumsum", "distributed_rank", "ntile_from_rank"]


def _opaque(c: Column) -> Column:
    """Value-identity wrapper that flags the expression NONDETERMINISTIC
    (``shuffle`` of a 1-element array is that array, but carries the
    flag), so Catalyst derives NO constraints from the alias. Without
    it, InferFiltersFromConstraints substitutes the t-side ``__bucket``
    ALIAS DEFINITION (still referencing t-side attribute ids) into a
    derived ``defn <=> __bucket`` predicate on the DEDUPLICATED offsets
    branch of the self-join — an invalid ``!Filter`` that dies at
    binding with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on the FIRST
    execution in a fresh session (Catalyst 4.1; reproduced +
    regression-tested). Alternatives measured and rejected: eager
    localCheckpoint of the totals also fixes it (fresh exprIds — no
    self-join) but serializes the upstream pipeline into its own job
    (+39% winsorized_revenue_stats, +61% group_exact_percentiles);
    ``persist()`` does NOT fix it (the cache is matched at physical
    planning, the logical self-join still dedups); a non-nullable
    ``coalesce`` wrap kills only the isnotnull variant of the
    inference. Nondeterministic projections are also never collapsed
    or re-substituted, so the fold evaluates exactly once per row."""
    return F.element_at(F.shuffle(F.array(c)), 1)


def _bucket_expr(vc: Column, cuts: list[float]) -> Column:
    """Bucket index = |{c in cuts : vc > c}| as a BALANCED BINARY
    ``when``-TREE — ⌈log2 |cuts|⌉ comparisons per row, whole-stage
    codegen, replacing the interpreted 63-step ``F.aggregate`` fold
    (r12 per-task-work cut, guide §1.2 step 2). Exact value twin of the
    fold for every input class: NULL takes the otherwise-branch at
    every node and lands in bucket 0 (fold: ``when`` yields otherwise-0
    for NULL comparisons); NaN compares greater than every literal
    under Spark's NaN ordering and lands in the top bucket (fold:
    every term 1). Measured (JVM-CPU A/B at sf0.1, both directions
    interleaved): winsorized_revenue_stats 3.1→1.9 s wall / 5.9→4.1 s
    CPU, group_exact_percentiles 2.3→1.4 s wall / 3.8→2.3 s CPU,
    results bit-identical.

    History: round 7 measured an UNROLLED 63-term comparison-sum chain
    ~1.5× slower than the fold — but that shape's cost was the wide
    chain re-inlining into every operator referencing ``__bucket``.
    Callers wrap the result in :func:`_opaque`, whose nondeterministic
    flag blocks exactly that re-substitution, so the tree (like the
    fold) evaluates once per row; the tree's advantage is that the one
    evaluation is 6 codegen comparisons instead of a 63-element
    interpreted ArrayAggregate."""
    if not cuts:  # constant column (or empty frame): single bucket
        return F.lit(0)

    def tree(lo: int, hi: int) -> Column:
        if lo > hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(vc > F.lit(float(cuts[mid])), tree(mid + 1, hi)).otherwise(
            tree(lo, mid - 1)
        )

    return tree(0, len(cuts) - 1)


def distributed_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    rank_col: str = "rn",
    count_col: str = "grp_n",
    n_buckets: int = 64,
    rel_err: float = 0.01,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Append ``rank_col`` = exact 1-based ``row_number() OVER
    ([PARTITION BY *group_cols] ORDER BY value_col, *tiebreak_cols)``
    and ``count_col`` = the (group's) total row count, computed with
    bounded per-task sorts (see module docstring).

    ``value_col`` must be numeric (cast dates to epoch days first);
    cutoffs are taken on its DOUBLE cast, which is monotone, so exotic
    numeric types (DECIMAL) bucket correctly — ties the double cast
    introduces merely co-locate rows, and the in-bucket sort uses the
    exact original value. Triggers one Spark job for the cutoffs
    (a production pipeline would persist them with the table stats).

    The bucket column is wrapped in :func:`_opaque` — load-bearing, see
    that helper's docstring for the Catalyst 4.1 self-join
    constraint-substitution bug it guards against and the alternatives
    measured.
    """
    vc = F.col(value_col).cast("double")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.select(vc.alias("__v")).approxQuantile("__v", probs, rel_err)
    cuts = sorted(set(c for c in cuts if c is not None))
    bucket = _bucket_expr(vc, cuts)
    g = list(group_cols)
    t = df.withColumn("__bucket", _opaque(bucket))
    local_w = Window.partitionBy(*g, "__bucket").orderBy(value_col, *tiebreak_cols)
    t = t.withColumn("__local_rank", F.row_number().over(local_w))

    totals = t.groupBy(*g, "__bucket").agg(F.count(F.lit(1)).alias("__total"))
    # Prefix over ≤ n_buckets rows per group — bounded by construction
    # (this is the one sanctioned unpartitioned window when g == []).
    prefix_w = Window.partitionBy(*g).orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    all_w = Window.partitionBy(*g).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = totals.select(
        *g,
        "__bucket",
        F.coalesce(F.sum("__total").over(prefix_w), F.lit(0)).alias("__prefix"),
        F.sum("__total").over(all_w).cast("long").alias(count_col),
    )
    # offsets is |groups|·n_buckets rows — broadcast for the common
    # bounded-group case; pass broadcast_offsets=False at extreme group
    # cardinality and let AQE pick the join (it's a plain equi-join).
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    return (
        t.join(offsets, [*g, "__bucket"])
        .withColumn(rank_col, (F.col("__prefix") + F.col("__local_rank")).cast("long"))
        .drop("__bucket", "__local_rank", "__prefix")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact ``ntile(k)`` from a 1-based total-order rank and the
    partition row count: the first ``n mod k`` tiles hold ``n div k + 1``
    rows, the rest ``n div k`` — the standard fill order. Exact at ANY
    row count: quotients are taken as ``floor`` of a DECIMAL(38,6)
    division (absolute error ≤ 5e-7, never the double round-trip whose
    error passes 1 beyond 2^53) and then corrected by a ±1 fix-up that
    re-checks the floor inequalities in exact decimal arithmetic — so
    the result is ``a div b`` for all longs. (Spark's native ``div`` /
    IntegralDivide is NOT used: under ANSI it is a can-throw expression
    and Catalyst 4.1 mis-binds the constraint it infers for it when the
    quotient feeds a projection above distributed_rank's offsets join —
    INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at execution.) Requires the
    rank's ORDER BY to be a total order (include a tiebreak key) or the
    assignment at tile boundaries is engine-dependent."""
    def idiv(a: Column, b: Column) -> Column:
        # floor(a/b) with decimal quotient, then exact-decimal fix-up.
        ad, bd = a.cast("decimal(38,0)"), b.cast("decimal(38,0)")
        q = F.floor(ad / bd).cast("long")
        qd = q.cast("decimal(38,0)")
        return (
            F.when((qd + 1) * bd <= ad, q + 1)
            .when(qd * bd > ad, q - 1)
            .otherwise(q)
        )

    s = idiv(n, F.lit(k))  # n div k (n, k non-negative)
    m = n - s * k  # n mod k
    big = m * (s + 1)  # rows covered by the (s+1)-sized tiles
    return (
        F.when(rank <= big, idiv(rank - 1, s + 1) + 1)
        .otherwise(m + idiv(rank - big - 1, F.greatest(s, F.lit(1))) + 1)
        .cast("int")
    )


def distributed_cumsum(
    df: DataFrame,
    value_col: str,
    sum_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
    n_buckets: int = 64,
    rel_err: float = 0.01,
) -> DataFrame:
    """Append ``<c>_cum`` = inclusive running sum of each column in
    ``sum_cols`` under ``ORDER BY value_col, *tiebreak_cols`` — the
    cumulative-distribution sibling of :func:`distributed_rank`, same
    two-level shape: quantile-cutoff buckets (order-aligned), local
    running sums inside each bucket (window PARTITIONED by bucket —
    ~n/n_buckets rows per task), bucket totals prefix-summed over the
    ≤n_buckets-row aggregate, broadcast back as offsets. Exactly
    reproduces ``SUM(c) OVER (ORDER BY value, ties ROWS UNBOUNDED
    PRECEDING..CURRENT)``, so oracles keep plain window SQL while the
    Spark plan never sorts the frame in one task. Sums are cast to
    BIGINT at the end — callers accumulating beyond 9.2e18 should
    pre-cast ``sum_cols`` to DECIMAL(38,0)."""
    vc = F.col(value_col).cast("double")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.select(vc.alias("__v")).approxQuantile("__v", probs, rel_err)
    cuts = sorted(set(c for c in cuts if c is not None))
    t = df.withColumn("__bucket", _opaque(_bucket_expr(vc, cuts)))
    local_w = (
        Window.partitionBy("__bucket")
        .orderBy(value_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in sum_cols:
        t = t.withColumn(f"__lc_{c}", F.sum(c).over(local_w))
    totals = t.groupBy("__bucket").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols]
    )
    prefix_w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket",
        *[
            F.coalesce(F.sum(f"__t_{c}").over(prefix_w), F.lit(0)).alias(f"__o_{c}")
            for c in sum_cols
        ],
    )
    out = t.join(F.broadcast(offsets), "__bucket")
    for c in sum_cols:
        out = out.withColumn(
            f"{c}_cum", (F.col(f"__o_{c}") + F.col(f"__lc_{c}")).cast("long")
        )
    return out.drop(
        "__bucket", *[f"__lc_{c}" for c in sum_cols], *[f"__o_{c}" for c in sum_cols]
    )
