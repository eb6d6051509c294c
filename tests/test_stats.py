"""Planted-value tests for operators/stats.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.stats import ab_test_ztest, pearson_corr_matrix


def test_corr_planted_exact_relationships(spark):
    # y = 2x (r = 1), z = -x (r = -1 with x), w constant (r undefined -> NULL)
    rows = [(float(i), 2.0 * i, -float(i), 5.0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    out = {(r.col1, r.col2): r for r in pearson_corr_matrix(df, ["x", "y", "z", "w"]).collect()}
    assert len(out) == 6
    assert all(r.n == 20 for r in out.values())
    assert out[("x", "y")].corr == 1.0
    assert out[("x", "z")].corr == -1.0
    assert out[("y", "z")].corr == -1.0
    assert out[("x", "w")].corr is None  # zero variance
    assert out[("y", "w")].corr is None
    assert out[("z", "w")].corr is None


def test_corr_deterministic_across_repartitioning(spark):
    rows = [(float(i), float(i * i % 7), float((i * 3) % 11), 1.0 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    cols = ["a", "b", "c", "d"]
    one = sorted(map(tuple, pearson_corr_matrix(df, cols).collect()))
    two = sorted(map(tuple, pearson_corr_matrix(df.repartition(7), cols).collect()))
    assert one == two


def test_ab_test_counts_and_z_sign(spark):
    # 40 units x 3 rows each; success iff the unit's value sum >= 6
    rows = [(u, 2.0 if u % 4 == 0 else 1.0) for u in range(40) for _ in range(3)]
    df = spark.createDataFrame(rows, "uid long, v double")
    out = ab_test_ztest(df, "uid", success=F.sum("v") >= 6.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_a + r.n_b == 40
    assert r.conv_a + r.conv_b == 10  # u % 4 == 0
    # arms are hash-assigned, so both sides must be non-empty with 40 units
    assert r.n_a > 0 and r.n_b > 0
    # rates recomputed from the counts the operator itself reports
    assert r.rate_a == round(r.conv_a / r.n_a, 4)
    assert r.rate_b == round(r.conv_b / r.n_b, 4)


def test_ab_test_stable_under_corpus_growth(spark):
    """Arm membership depends only on the unit id: adding units never
    moves an old unit between arms."""
    base = spark.createDataFrame([(u, 1.0) for u in range(30)], "uid long, v double")
    grown = spark.createDataFrame([(u, 1.0) for u in range(60)], "uid long, v double")

    def arms(df):
        from is3107datapipelineproject_spark.operators.sampling import hash_unit

        return {
            r.uid: r.a
            for r in df.select("uid", (hash_unit("uid", "ab") < 0.5).alias("a")).distinct().collect()
        }

    a1, a2 = arms(base), arms(grown)
    assert all(a2[u] == a1[u] for u in a1)


def test_grouped_ols_recovers_planted_line(spark):
    # group 'g1': y = 3x + 2 exactly; 'g2': y = -0.5x + 10; 'g3': constant x
    rows = [("g1", float(i), 3.0 * i + 2.0) for i in range(1, 21)]
    rows += [("g2", float(i), -0.5 * i + 10.0) for i in range(1, 21)]
    rows += [("g3", 7.0, float(i)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    from is3107datapipelineproject_spark.operators.stats import grouped_ols

    out = {r.g: r for r in grouped_ols(df, "g", "x", "y").collect()}
    assert out["g1"].slope == 3.0 and out["g1"].intercept == 2.0 and out["g1"].r2 == 1.0
    assert out["g2"].slope == -0.5 and out["g2"].intercept == 10.0 and out["g2"].r2 == 1.0
    assert out["g3"].slope is None and out["g3"].intercept is None and out["g3"].r2 is None
