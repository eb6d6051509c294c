"""salted_join must be bag-equal to the plain join it replaces —
including duplicate keys (fan-out) and left-outer unmatched rows."""

from __future__ import annotations

from collections import Counter

from is3107datapipelineproject_spark.operators.relational import salted_join


def _bag(df):
    return Counter(tuple(r) for r in df.collect())


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "d")],  # dup key + dup row
        "k long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 20.0), (4, 40.0)],  # fan-out key + unmatched
        "k long, rv double",
    )
    for how in ("inner", "left"):
        plain = left.join(right, "k", how).select("k", "lv", "rv")
        salted = salted_join(left, right, "k", n_salts=5, how=how).select("k", "lv", "rv")
        assert _bag(salted) == _bag(plain), how


def test_salted_join_rejects_right_preserving_joins(spark):
    import pytest

    left = spark.createDataFrame([(1, "a")], "k long, lv string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, rv double")
    for how in ("right", "full", "full_outer", "right_semi", "cross"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(left, right, "k", how=how)
    # semi/anti against the replicated right are existence tests — still exact
    semi = salted_join(left, right, "k", n_salts=5, how="left_semi")
    anti = salted_join(left, right, "k", n_salts=5, how="left_anti")
    assert semi.count() == 1 and anti.count() == 0
