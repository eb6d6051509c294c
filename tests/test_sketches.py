"""Mergeable-sketch invariants (the 100 TB count-distinct path) and the
runtime bloom-filter join optimization."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from is3107datapipelineproject_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_hll_union_equals_global_sketch(spark):
    """Merging per-group sketches must give the SAME estimate as one
    global sketch — registers merge by max, so partition-parallel sketch
    building loses nothing. This is what makes the op safe to run as
    one sketch per 100 GB split."""
    e = load_table(spark, SF_ORACLE, "events")
    merged = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id", 12).alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).cast("long").alias("est"))
        .collect()[0]["est"]
    )
    global_ = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).cast("long").alias("est")
    ).collect()[0]["est"]
    assert merged == global_
    exact = e.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05  # lgConfigK=12 → ~1.6% rse


def test_hll_query_registered(spark):
    from is3107datapipelineproject_spark.workload.registry import queries

    rows = queries()["hll_mergeable_sketch"](spark, SF_ORACLE).collect()
    types = {r["event_type"] for r in rows}
    assert "ALL" in types and len(types) == 6
    # hash-checkable contract: every sketch estimate (per-type AND the
    # merged ALL sketch) must land within the 5% tolerance band
    assert all(r["within_tol"] for r in rows)
    all_exact = next(r["exact_users"] for r in rows if r["event_type"] == "ALL")
    assert all(r["exact_users"] <= all_exact for r in rows)


def test_runtime_bloom_filter_join(spark):
    """A selective dim filter joined to a big fact should inject a
    runtime bloom filter on the fact side (row-level semi-join
    pre-filter BEFORE the shuffle) when the bloom confs are on —
    the Spark-4 spelling is spark.sql.optimizer.runtime.bloomFilter.*."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # production default is 10GB — at test SF the fact scan is KB-sized,
        # so drop the floor to let the injection trigger on the same shape
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join so the filter pays
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
        o = (
            load_table(spark, SF_ORACLE, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).agg(
            F.sum("l_quantity").alias("q")
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower() or "BloomFilter" in plan, plan[:2000]
        assert j.collect()[0]["q"] is not None
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cms_merge_bit_identical_and_bounds(spark):
    """Count-min sketch invariants: (1) sketches built on corpus slices
    and merged are BIT-identical to one built on the whole corpus
    (counter addition commutes) — the per-shard/day build shape at
    100 TB; (2) estimates never undercount; (3) estimates respect the
    (2/w)·N error bound on this corpus."""
    from is3107datapipelineproject_spark.operators import sketches as K
    from is3107datapipelineproject_spark.operators.text import ws_tokens

    docs = load_table(spark, SF_ORACLE, "documents")
    toks = docs.select(
        "doc_id", F.explode(ws_tokens("text")).alias("token")
    )
    counts_all = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    full = K.cms_build(counts_all, "token", "cnt")

    halves = [
        toks.filter(F.col("doc_id") % 2 == i)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        for i in (0, 1)
    ]
    merged = K.cms_merge(*[K.cms_build(h, "token", "cnt") for h in halves])

    as_map = lambda df: {(r.row, r.bucket): r.bucket_cnt for r in df.collect()}
    assert as_map(full) == as_map(merged)

    exact = {r.token: r.cnt for r in counts_all.collect()}
    n_total = sum(exact.values())
    probes = counts_all.select("token").limit(200)
    ests = {
        r.token: r.cms_est
        for r in K.cms_estimate(full, probes, "token").collect()
    }
    assert ests and all(ests[t] >= exact[t] for t in ests)
    assert all(ests[t] <= exact[t] + 2.0 / K.CMS_W * n_total for t in ests)


def test_cms_unseen_item_estimates_low(spark):
    """A probe item the sketch never saw can only pick up collision
    mass — bounded by the eps band, and zero if its buckets are empty."""
    from is3107datapipelineproject_spark.operators import sketches as K

    counts = spark.createDataFrame(
        [("alpha", 10), ("beta", 5)], ["token", "cnt"]
    )
    sk = K.cms_build(counts, "token", "cnt")
    probes = spark.createDataFrame([("never-seen-token-xyz",)], ["token"])
    est = K.cms_estimate(sk, probes, "token").collect()[0]
    assert 0 <= est.cms_est <= 15


def test_bloom_no_false_negatives_and_merge(spark):
    """Every inserted item must probe positive (structural no-false-
    negative guarantee); filters built on slices and unioned behave as
    the bit-OR of the slices (set semantics)."""
    from is3107datapipelineproject_spark.operators import sketches as K

    items = spark.range(0, 500).select(F.col("id").cast("string").alias("g"))
    bloom = K.bloom_build(items, "g")
    probed = K.bloom_probe(bloom, items, "g")
    assert probed.filter(~F.col("bloom_hit")).count() == 0

    halves = [
        items.filter(F.col("g").cast("long") % 2 == i) for i in (0, 1)
    ]
    merged = (
        K.bloom_build(halves[0], "g")
        .unionByName(K.bloom_build(halves[1], "g"))
        .distinct()
    )
    as_set = lambda df: {(r.row, r.bit) for r in df.collect()}
    assert as_set(merged) == as_set(bloom)

    # unseen probes: mostly negative at this load factor (n·d ≪ m)
    unseen = spark.range(10_000, 10_500).select(F.col("id").cast("string").alias("g"))
    fp = K.bloom_probe(bloom, unseen, "g").filter(F.col("bloom_hit")).count()
    assert fp < 25  # theory: ~(1-e^(-4*500/65536))^4 ≈ 8e-7 per probe

    # duplicate probe rows must not break the all-bits-set count
    dup = items.unionByName(items)
    assert K.bloom_probe(bloom, dup, "g").filter(~F.col("bloom_hit")).count() == 0


def test_hist_merge_equals_global_and_quantile_error_bound(spark):
    """Fixed-boundary histogram: shard-built+merged == global-built
    bit-for-bit, and each quantile estimate is within one bin width of
    the exact quantile."""
    from is3107datapipelineproject_spark.operators.sketches import (
        hist_build,
        hist_merge,
        hist_quantiles,
    )

    vals = [(i, float(901 + (i * 37) % 5000)) for i in range(2000)]
    df = spark.createDataFrame(vals, ["k", "v"])
    global_sk = hist_build(df, "v")
    shards = [hist_build(df.filter(F.col("k") % 3 == i), "v") for i in range(3)]
    merged = hist_merge(*shards)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, global_sk.collect()))

    got = {r["q"]: r["est_upper"] for r in hist_quantiles(merged, [0.5, 0.9]).collect()}
    exact = df.selectExpr("percentile(v, 0.5) p50", "percentile(v, 0.9) p90").first()
    assert abs(got[0.5] - exact["p50"]) <= 100.0
    assert abs(got[0.9] - exact["p90"]) <= 100.0
