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


def test_adaptive_salting_triggers_only_on_skew(spark):
    """detect-then-salt: uniform keys must take the plain join (no salt
    column anywhere in the plan — salting costs n_salts x shuffle volume);
    a planted straggler key must flip to the salted plan, bag-exactly."""
    from pyspark.sql import functions as F

    from is3107datapipelineproject_spark.operators.relational import (
        adaptive_salted_join,
        hot_key_share,
    )

    right = spark.createDataFrame([(k, k * 10.0) for k in range(100)], "k long, rv double")
    uniform = spark.range(10_000).select((F.col("id") % 100).alias("k"), F.col("id").alias("lv"))
    skewed = spark.range(10_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("lv"),
    )

    assert hot_key_share(uniform, "k", sample_fraction=0.5) < 0.05
    assert hot_key_share(skewed, "k", sample_fraction=0.5) > 0.9

    plain = adaptive_salted_join(uniform, right, "k", sample_fraction=0.5)
    assert "__salt" not in plain._jdf.queryExecution().analyzed().toString()

    salted = adaptive_salted_join(skewed, right, "k", sample_fraction=0.5)
    assert "__salt" in salted._jdf.queryExecution().analyzed().toString()
    assert _bag(salted.select("k", "lv", "rv")) == _bag(
        skewed.join(right, "k").select("k", "lv", "rv")
    )


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew-join split is the FIRST line of defense the
    session relies on (manual salting is the documented escape hatch for
    what AQE can't see) — prove the session confs actually engage it:
    a planted hot key under a forced sort-merge join must come out of
    adaptive planning with the skew=true marker and still produce exact
    results."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # production defaults are 256MB-scale; test rows are KBs, so
        # drop thresholds to let the same machinery trigger on the shape
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") % 3 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("padpadpadpadpadpadpadpad-"), F.col("id")).alias("lv"),
        )
        right = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("rv"))
        j = left.join(right, "k")
        # execute THIS frame (count() would build a different query whose
        # adaptive plan finalizes separately)
        got = len(j.collect())
        want = left.filter(F.col("k") < 1000).count()  # right matches k in [0,1000)
        assert got == want
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
