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


def test_ntile_from_rank_exact_beyond_double_range(spark):
    """The decimal-floor + fix-up division must stay exact where the
    old double round-trip drifts: ranks/counts past 2^53, awkward
    near-boundary quotients, tiny k remainders. Compare against Python
    integer arithmetic on literal columns."""
    from is3107datapipelineproject_spark.operators.ranking import ntile_from_rank

    def py_ntile(rank: int, n: int, k: int) -> int:
        s, m = divmod(n, k)
        big = m * (s + 1)
        if rank <= big:
            return (rank - 1) // (s + 1) + 1
        return m + (rank - big - 1) // max(s, 1) + 1

    cases = []
    for n in [1, 3, 4, 7, 10**6 + 3, (1 << 53) + 5, (1 << 60) + 7]:
        for rank in {1, 2, n // 3 + 1, n // 2, n - 1 if n > 1 else 1, n}:
            for k in (4, 7):
                cases.append((rank, n, k))
    df = spark.createDataFrame(
        [(r, n, k) for (r, n, k) in cases], "rank LONG, n LONG, k INT"
    )
    got4 = df.filter(F.col("k") == 4).select(
        "rank", "n", ntile_from_rank(F.col("rank"), F.col("n"), 4).alias("t")
    )
    got7 = df.filter(F.col("k") == 7).select(
        "rank", "n", ntile_from_rank(F.col("rank"), F.col("n"), 7).alias("t")
    )
    for k, got in ((4, got4), (7, got7)):
        for row in got.collect():
            assert row.t == py_ntile(row.rank, row.n, k), (row.rank, row.n, k)


def test_distributed_rank_first_execution_fresh_session():
    """Regression pin for the Catalyst 4.1 self-join
    constraint-substitution crash (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND):
    it only fires on the FIRST execution in a fresh session, which the
    shared-session suite can never see — so drive a grouped
    distributed_rank as the very first action of a SUBPROCESS session.
    Guards the _opaque barrier in operators/ranking.py."""
    import subprocess
    import sys

    code = """
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.ansi.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
from is3107datapipelineproject_spark.operators.ranking import distributed_rank
df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
    "o_orderpriority", F.year("o_orderdate").cast("int").alias("o_year"),
    "o_orderkey", "o_totalprice")
out = distributed_rank(df, "o_totalprice", ["o_orderkey"],
                       group_cols=["o_orderpriority", "o_year"])
print("FIRST_EXEC_ROWS", out.count())
spark.stop()
"""
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "FIRST_EXEC_ROWS 1500" in res.stdout, res.stderr[-2000:]
