"""Planted-structure tests for the k-means / SemDeDup operators
(operators/clustering.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from is3107datapipelineproject_spark.operators.clustering import kmeans_assign, semantic_dedup

_SCHEMA = T.StructType(
    [
        T.StructField("vid", T.LongType()),
        T.StructField("vec", T.ArrayType(T.FloatType())),
    ]
)


def _planted(spark):
    """Two tight groups far apart; ids interleave across groups so the
    deterministic init (2 smallest ids) seeds one centroid in each."""
    rows = []
    for i in range(10):
        rows.append((2 * i, [10.0 + 0.01 * i, 0.0, 0.0]))  # group A near (10,0,0)
        rows.append((2 * i + 1, [0.0, 10.0 + 0.01 * i, 0.0]))  # group B near (0,10,0)
    return spark.createDataFrame(rows, _SCHEMA)


def test_kmeans_separates_planted_groups(spark):
    df = _planted(spark)
    out = kmeans_assign(df, "vid", "vec", k=2, iters=2).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r.cluster, set()).add(r.vid)
    assert len(out) == 20
    assert set(by_cluster) == {0, 1}
    # init: vid 0 (group A) -> cid 0, vid 1 (group B) -> cid 1
    assert by_cluster[0] == {2 * i for i in range(10)}
    assert by_cluster[1] == {2 * i + 1 for i in range(10)}
    # converged assignment puts every point near its own centroid
    assert all(r.d2 < 1.0 for r in out)


def test_kmeans_deterministic_across_repartitioning(spark):
    df = _planted(spark)
    a = sorted((r.vid, r.cluster, r.d2) for r in kmeans_assign(df, "vid", "vec", k=2, iters=2).collect())
    b = sorted(
        (r.vid, r.cluster, r.d2)
        for r in kmeans_assign(df.repartition(7), "vid", "vec", k=2, iters=2).collect()
    )
    assert a == b


def test_semantic_dedup_drops_higher_id_neardup(spark):
    df = _planted(spark)
    # plant an exact duplicate of vid 0 with a HIGHER id, and one with a
    # near-but-not-identical direction below the threshold
    extra = spark.createDataFrame(
        [(100, [10.0, 0.0, 0.0]), (101, [10.0, 9.0, 0.0])], _SCHEMA
    )
    out = semantic_dedup(df.union(extra), "vid", "vec", k=2, iters=2, threshold=0.999).collect()
    kept = {r.vid for r in out if r.is_kept}
    dropped = {r.vid for r in out if not r.is_kept}
    assert 100 in dropped  # duplicate of vid 0 (cosine 1.0), higher id loses
    assert 0 in kept  # the smaller-id representative survives
    assert 101 in kept  # cosine ~0.74 < 0.999 -> not a dup
    # group members are mutually near-parallel within a group: with the
    # tight 0.999 threshold the later members of each group also collapse
    # onto the group's smallest id — every drop must have a smaller-id
    # cluster-mate kept
    clusters = {r.vid: r.cluster for r in out}
    for d in dropped:
        assert any(kv < d and clusters[kv] == clusters[d] for kv in kept)


def test_semantic_dedup_hot_cluster_cap_switches_to_star(spark):
    """Degenerate input: every vector lands in ONE cluster (k=1) of size
    12 — the boilerplate-collapse case. With max_cluster below the
    cluster size the pair search must switch to the O(n) star
    comparison: a member near its NEIGHBOR but far from the min-id
    representative stays kept (the documented recall tradeoff), instead
    of being chained away by the quadratic exists-smaller-neighbor rule.
    """
    import math

    rows = [
        (i, [math.cos(math.radians(10.0 * i)), math.sin(math.radians(10.0 * i)), 0.0])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, _SCHEMA)

    # capped: size 12 > cap 5 -> star vs vid 0. cos(i*10deg) >= 0.9 only
    # for i in {1, 2}; adjacent members stay near-parallel but that no
    # longer matters.
    star = semantic_dedup(df, "vid", "vec", k=1, iters=1, threshold=0.9, max_cluster=5).collect()
    assert all(r.cluster == 0 for r in star)
    assert {r.vid for r in star if not r.is_kept} == {1, 2}

    # uncapped twin on the same data: the exists-smaller-NEIGHBOR chain
    # (adjacent cos(10deg) ~ 0.985) drops everything but the min id.
    quad = semantic_dedup(df, "vid", "vec", k=1, iters=1, threshold=0.9, max_cluster=100).collect()
    assert {r.vid for r in quad if r.is_kept} == {0}


def test_kmeans_assignment_plan_is_narrow(spark):
    """The assignment side must not expand the corpus k-fold or shuffle
    it: the codebook arrives by broadcast and the argmin is a per-row
    fold. Guard: no hashpartitioning exchange keyed on the point id in
    the final-assignment subtree."""
    df = _planted(spark)
    plan = (
        kmeans_assign(df, "vid", "vec", k=2, iters=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(vid" not in plan


def test_two_level_matches_flat_on_separated_groups(spark):
    """With well-separated planted groups the group prune is lossless:
    the two-level assignment must equal the flat argmin."""
    from is3107datapipelineproject_spark.operators.clustering import kmeans_assign_two_level

    df = _planted(spark)
    flat = {r.vid: r.cluster for r in kmeans_assign(df, "vid", "vec", k=2, iters=2).collect()}
    two = kmeans_assign_two_level(df, "vid", "vec", k=2, groups=2, iters=2).collect()
    assert len(two) == 20
    assert {r.vid: r.cluster for r in two} == flat
    # groups are the centroids' own ids here (k == groups)
    assert all(r.group_id in (0, 1) for r in two)


def test_two_level_plan_is_narrow(spark):
    from is3107datapipelineproject_spark.operators.clustering import kmeans_assign_two_level

    df = _planted(spark)
    plan = (
        kmeans_assign_two_level(df, "vid", "vec", k=4, groups=2, iters=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(vid" not in plan


def test_incremental_semantic_neardup_planted(spark):
    """new×old semantic pairs against a frozen corpus model: exact
    within-cluster pairs for small clusters, min-id star for clusters
    past the cap, arrivals in a foreign cluster match nothing, and the
    old×old / new×new spaces are never compared."""
    import math

    from is3107datapipelineproject_spark.operators.clustering import (
        incremental_semantic_neardup,
    )

    # two well-separated corpus groups: x-axis-ish (ids 0..3) and
    # y-axis-ish (ids 10..13)
    old = spark.createDataFrame(
        [(i, [10.0, 0.1 * i, 0.0]) for i in range(4)]
        + [(10 + i, [0.1 * i, 10.0, 0.0]) for i in range(4)],
        _SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (100, [10.0, 0.0, 0.0]),   # parallel to old 0 -> pairs in x-cluster
            (101, [0.0, 10.0, 0.0]),   # parallel to old 10 -> pairs in y-cluster
            (102, [0.0, 0.0, 10.0]),   # z-axis: routed somewhere, cosine ~0 -> no pairs
        ],
        _SCHEMA,
    )
    out = incremental_semantic_neardup(
        old, new, "vid", "vec", k=2, iters=2, threshold=0.99
    ).collect()
    pairs = {(r.new_id, r.old_id) for r in out}
    assert (100, 0) in pairs and (101, 10) in pairs
    assert all(n in (100, 101) for n, _ in pairs), pairs
    assert all(o < 100 for _, o in pairs), "old side only"
    assert not any(n == 102 for n, _ in pairs)

    # hot-cluster star: 12 fan vectors in one cluster, cap 5 -> each
    # arrival compares ONLY against min-id old member 0
    fan = spark.createDataFrame(
        [
            (i, [math.cos(math.radians(10.0 * i)), math.sin(math.radians(10.0 * i)), 0.0])
            for i in range(12)
        ],
        _SCHEMA,
    )
    arrivals = spark.createDataFrame(
        [(200, [1.0, 0.0, 0.0]), (201, [0.0, 1.0, 0.0])], _SCHEMA
    )
    star = incremental_semantic_neardup(
        fan, arrivals, "vid", "vec", k=1, iters=1, threshold=0.9, max_cluster=5
    ).collect()
    # 200 is parallel to old 0 (cos 1.0 >= 0.9); 201 is at 90deg from
    # old 0 (cos 0.0) even though it is parallel to old 9 — the star
    # only sees the representative (documented recall tradeoff)
    assert {(r.new_id, r.old_id) for r in star} == {(200, 0)}

    # uncapped twin on the same data finds 201's true neighbors too
    quad = incremental_semantic_neardup(
        fan, arrivals, "vid", "vec", k=1, iters=1, threshold=0.9, max_cluster=100
    ).collect()
    got_201 = {r.old_id for r in quad if r.new_id == 201}
    assert {8, 9, 10, 11} <= got_201
