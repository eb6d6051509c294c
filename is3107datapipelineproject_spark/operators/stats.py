"""Exact-moment statistics operators: Pearson correlation matrix and a
two-proportion A/B z-test.

Both reduce the corpus to a HANDFUL of exact sufficient statistics in
one partial-aggregated pass (map-side combine, nothing corpus-sized
crosses the shuffle), then evaluate the textbook formula driver-side-free
as a fixed scalar expression over that 1-row frame. That is the shape
that survives 100 TB: the scan is the only cost, the aggregate state is
O(#columns²) numbers, and the final arithmetic is constant work.

Determinism contract (shared with daily_anomaly_zscore): every sum is
accumulated in DECIMAL (order-independent under any partitioning), the
float division/sqrt happens ONCE per output value in a fixed expression,
and the result is rounded before it leaves the operator — so a SQL
oracle replays it hash-exactly.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# values are cast to DECIMAL(18,4) before any product: the synthetic
# numerics are 2-dp money/rate columns, so the cast is exact, and
# products fit DECIMAL(38,8) with room for 1e13-row sums.
_VAL = "decimal(18,4)"
_ACC = "decimal(38,8)"


def _dsum(c: Column) -> Column:
    return F.sum(c.cast(_ACC))


def pearson_corr_matrix(
    df: DataFrame, cols: Sequence[str], decimals: int = 4
) -> DataFrame:
    """Pearson r for every unordered pair of ``cols`` (null rows in a
    pair's columns excluded per-pair via zeroed indicator sums):
    ``(col1, col2, n, corr)`` — one corpus pass building the exact
    moment sums, #pairs output rows.

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    All moments are DECIMAL-exact; r is one double expression rounded to
    ``decimals``. Pairs where either variance is zero return NULL (the
    SQL convention), not an error.
    """
    vals = {c: F.col(c).cast(_VAL) for c in cols}
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(_dsum(vals[c]).alias(f"s_{c}"))
        aggs.append(_dsum(vals[c] * vals[c]).alias(f"ss_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(_dsum(vals[a] * vals[b]).alias(f"sp_{a}_{b}"))
    m = df.agg(*aggs)

    def _r(a: str, b: str) -> Column:
        n = F.col("n").cast("double")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        cov = n * F.col(f"sp_{a}_{b}").cast("double") - sa * sb
        va = n * F.col(f"ss_{a}").cast("double") - sa * sa
        vb = n * F.col(f"ss_{b}").cast("double") - sb * sb
        den = F.sqrt(va * vb)
        return F.round(F.when(den > 0, cov / den), decimals)

    pair_rows = [
        F.struct(
            F.lit(a).alias("col1"),
            F.lit(b).alias("col2"),
            F.col("n").alias("n"),
            _r(a, b).alias("corr"),
        )
        for a, b in combinations(cols, 2)
    ]
    return (
        m.select(F.explode(F.array(*pair_rows)).alias("p"))
        .select("p.col1", "p.col2", "p.n", "p.corr")
    )


def ab_test_ztest(
    df: DataFrame,
    unit_col: str,
    success: Column,
    salt: str = "ab",
    decimals: int = 4,
) -> DataFrame:
    """Deterministic A/B readout: units are hash-assigned to two arms
    (same md5 primitive as ``sampling.hash_split`` — membership is
    stable under corpus growth and replayable in SQL), ``success`` is a
    boolean AGGREGATE expression evaluated per unit (e.g.
    ``F.max(F.col("event_type") == "purchase")`` or a count threshold),
    and the result is ONE row:
    ``(n_a, n_b, conv_a, conv_b, rate_a, rate_b, z_score)`` with the
    two-proportion pooled z statistic

        z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)).

    Plan: one unit-level aggregate (the only shuffle, on ``unit_col``)
    → four integer counts → fixed scalar expression. Rates and z are
    rounded to ``decimals``; arms with zero units yield NULL z.
    """
    from is3107datapipelineproject_spark.operators.sampling import hash_unit

    arm = (hash_unit(unit_col, salt) < F.lit(0.5)).alias("_is_a")
    per_unit = (
        df.withColumn("_is_a", arm)
        .groupBy(F.col(unit_col).alias("_u"), F.col("_is_a"))
        .agg(success.alias("_conv"))
    )
    counts = per_unit.agg(
        F.sum(F.when(F.col("_is_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("_is_a"), 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("_is_a") & F.col("_conv"), 1).otherwise(0)).cast("long").alias("conv_a"),
        F.sum(F.when(~F.col("_is_a") & F.col("_conv"), 1).otherwise(0)).cast("long").alias("conv_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pooled = (ca + cb) / (na + nb)
    se = F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    return counts.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(ca / na, decimals).alias("rate_a"),
        F.round(cb / nb, decimals).alias("rate_b"),
        F.round(F.when((na > 0) & (nb > 0) & (se > 0), (ca / na - cb / nb) / se), decimals).alias("z_score"),
    )


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    decimals: int = 4,
) -> DataFrame:
    """Per-group simple linear regression y = a + b·x from exact
    moments: ``(group_col, n, slope, intercept, r2)``.

        b = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        a = (Σy − b·Σx) / n
        r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    Same contract as :func:`pearson_corr_matrix`: one partial-aggregated
    pass to DECIMAL-exact sums per group (the shuffle carries #groups
    rows of constant state), then fixed rounded double expressions —
    zero-variance x gives NULL slope/intercept/r2."""
    x, y = F.col(x_col).cast(_VAL), F.col(y_col).cast(_VAL)
    m = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _dsum(x).alias("sx"),
        _dsum(y).alias("sy"),
        _dsum(x * x).alias("sxx"),
        _dsum(y * y).alias("syy"),
        _dsum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    b = cov / vx
    return m.select(
        group_col,
        "n",
        F.round(F.when(vx > 0, b), decimals).alias("slope"),
        F.round(F.when(vx > 0, (sy - b * sx) / n), decimals).alias("intercept"),
        F.round(F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy)), decimals).alias("r2"),
    )
