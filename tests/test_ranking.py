"""operators/ranking.py: the two-level distributed rank must EXACTLY
reproduce the single-window semantics it replaces — rank, group counts,
ntile, cume — including tie runs that straddle bucket boundaries and
degenerate shapes (constant column → one bucket; tiny frames where
n < k for ntile)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.ranking import (
    distributed_rank,
    ntile_from_rank,
)


def _frame(spark, n=500, groups=0):
    # deterministic pseudo-random values with heavy ties (mod 37)
    rows = [((i * 7919) % 37, i, f"g{i % groups}" if groups else "g") for i in range(n)]
    return spark.createDataFrame(rows, ["v", "id", "g"])


def test_global_rank_matches_window(spark):
    df = _frame(spark)
    got = distributed_rank(df, "v", ["id"], n_buckets=8)
    w = Window.orderBy("v", "id")
    want = df.select(
        "id",
        F.row_number().over(w).alias("rn_want"),
        F.count(F.lit(1)).over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("n_want"),
    )
    bad = (
        got.join(want, "id")
        .filter((F.col("rn") != F.col("rn_want")) | (F.col("grp_n") != F.col("n_want")))
        .count()
    )
    assert bad == 0


def test_grouped_rank_matches_window(spark):
    df = _frame(spark, groups=3)
    got = distributed_rank(df, "v", ["id"], group_cols=["g"], n_buckets=8)
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.select(
        "id",
        F.row_number().over(w).alias("rn_want"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n_want"),
    )
    bad = (
        got.join(want, "id")
        .filter((F.col("rn") != F.col("rn_want")) | (F.col("grp_n") != F.col("n_want")))
        .count()
    )
    assert bad == 0


def test_constant_column_single_bucket(spark):
    df = spark.createDataFrame([(5, i) for i in range(20)], ["v", "id"])
    got = {r.id: r.rn for r in distributed_rank(df, "v", ["id"], n_buckets=8).collect()}
    assert got == {i: i + 1 for i in range(20)}


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 10, 11, 100])
def test_ntile_from_rank_matches_builtin(spark, n):
    df = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    w = Window.orderBy("id")
    out = df.select(
        "id",
        F.ntile(4).over(w).alias("want"),
        ntile_from_rank(
            F.row_number().over(w), F.count(F.lit(1)).over(
                Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ), 4
        ).alias("got"),
    )
    assert out.filter(F.col("got") != F.col("want")).count() == 0


def test_distributed_cumsum_matches_window(spark):
    from is3107datapipelineproject_spark.operators.ranking import distributed_cumsum

    df = _frame(spark).withColumn("a", (F.col("id") % 11).cast("long")).withColumn(
        "b", (F.col("id") % 3).cast("long")
    )
    got = distributed_cumsum(df, "v", ["a", "b"], tiebreak_cols=["id"], n_buckets=8)
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select(
        "id",
        F.sum("a").over(w).cast("long").alias("a_cum"),
        F.sum("b").over(w).cast("long").alias("b_cum"),
    )
    g = {r.id: (r.a_cum, r.b_cum) for r in got.select("id", "a_cum", "b_cum").collect()}
    e = {r.id: (r.a_cum, r.b_cum) for r in want.collect()}
    assert g == e


def test_distributed_cumsum_constant_column(spark):
    from is3107datapipelineproject_spark.operators.ranking import distributed_cumsum

    df = _frame(spark, n=50).withColumn("v", F.lit(1)).withColumn(
        "a", F.lit(2).cast("long")
    )
    got = distributed_cumsum(df, "v", ["a"], tiebreak_cols=["id"], n_buckets=8)
    rows = {r.id: r.a_cum for r in got.collect()}
    assert rows == {i: 2 * (i + 1) for i in range(50)}
