"""Invariant tests for the graph / fuzzy-matching operators
(operators/graph.py, operators/fuzzy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.fuzzy import blocked_fuzzy_pairs
from is3107datapipelineproject_spark.operators.graph import SCALE, pagerank, undirected_to_directed


def _star_edges(spark):
    """Hub node 0 linked to leaves 1..4 (weight 1 each): the hub must
    out-rank every leaf, and leaves are symmetric so their ranks tie."""
    pairs = spark.createDataFrame(
        [(0, i, 1) for i in range(1, 5)], ["m1", "m2", "w"]
    )
    return undirected_to_directed(pairs, "m1", "m2", "w")


def test_pagerank_hub_dominates_and_leaves_tie(spark):
    pr = {r["node"]: r["pr"] for r in pagerank(_star_edges(spark), iterations=3).collect()}
    assert set(pr) == {0, 1, 2, 3, 4}
    leaf_ranks = {pr[i] for i in range(1, 5)}
    assert len(leaf_ranks) == 1, "symmetric leaves must tie exactly (integer determinism)"
    assert pr[0] > pr[1]


def test_pagerank_mass_bounds(spark):
    """Integer truncation can only LEAK mass: total stays within
    (N·SCALE·(1-leak), N·SCALE]; every rank ≥ the teleport base."""
    pr = pagerank(_star_edges(spark), iterations=3).collect()
    total = sum(r["pr"] for r in pr)
    n = len(pr)
    assert total <= n * SCALE
    assert total > n * SCALE * 0.99
    base = 15 * SCALE // 100
    assert all(r["pr"] >= base for r in pr)


def test_pagerank_partitioning_invariant(spark):
    """BIGINT fixed-point ranks are bit-identical under different
    shuffle parallelism (the determinism contract the oracle relies on)."""
    edges = _star_edges(spark)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    a = sorted(tuple(r) for r in pagerank(edges, iterations=3).collect())
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(tuple(r) for r in pagerank(edges, iterations=3).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_pagerank_edge_subtree_executes_once(spark):
    """edge_norm stays lazy (the ×100-measured choice — SCALING.md
    round-5 A/B): the identical edge-construction subtree appears in
    every iteration's lineage, and ReuseExchange must collapse those
    into ONE physical execution. Executed-plan assertion: after running
    the query, the finalized plan contains ReusedExchange nodes and the
    edge leaf is NOT scanned once per iteration."""
    df = pagerank(_star_edges(spark), iterations=3)
    df.collect()  # finalize the (adaptive) plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, "iteration lineage must reuse the edge exchange"
    # 3 iterations + rank init all reference the edge frame; without
    # reuse the leaf would appear 4+ times.
    assert plan.count("LocalTableScan") <= 2, "edge subtree re-executed per iteration"


def _names(spark, rows):
    return spark.createDataFrame([(n,) for n in rows], ["name"])


def test_fuzzy_pairs_within_threshold_only(spark):
    df = _names(spark, ["alpha bravo", "alpha bravp", "alpha zulu", "beta bravo"])
    got = blocked_fuzzy_pairs(
        df, "name", block_expr=F.split_part(F.col("name"), F.lit(" "), F.lit(1)), max_dist=2
    ).collect()
    pairs = {(r["name_a"], r["name_b"]) for r in got}
    # one-edit pair matches; cross-block "beta bravo" never compares
    assert pairs == {("alpha bravo", "alpha bravp")}
    assert all(r["dist"] <= 2 for r in got)


def test_fuzzy_hot_block_dropped(spark):
    """A block over max_block is dropped whole (guard), others survive."""
    hot = [f"stop word{i:03d}" for i in range(20)]
    cool = ["rare gem", "rare gen"]
    got = blocked_fuzzy_pairs(
        _names(spark, hot + cool),
        "name",
        block_expr=F.split_part(F.col("name"), F.lit(" "), F.lit(1)),
        max_dist=3,
        max_block=10,
    ).collect()
    assert {(r["name_a"], r["name_b"]) for r in got} == {("rare gem", "rare gen")}


def test_fuzzy_extra_columns_ride_along(spark):
    df = spark.createDataFrame([("one two", 7), ("one twp", 9)], ["name", "k"])
    got = blocked_fuzzy_pairs(
        df, "name", block_expr=F.split_part(F.col("name"), F.lit(" "), F.lit(1)), max_dist=1
    ).collect()
    assert len(got) == 1 and got[0]["k_a"] == 7 and got[0]["k_b"] == 9


def test_entity_resolution_transitive_canonical(spark):
    """A chain a—b, b—c (but a↛c directly) must still resolve to ONE
    entity via the transitive closure, labeled with the min name."""
    from is3107datapipelineproject_spark.operators.dedup import neardup_clusters

    names = ["acme corp", "acme corp.", "acme corpx.", "other thing"]
    ents = spark.createDataFrame([(n,) for n in names], ["name"])
    pairs = blocked_fuzzy_pairs(
        ents, "name", block_expr=F.split_part(F.col("name"), F.lit(" "), F.lit(1)), max_dist=1
    ).select(F.col("name_a").alias("doc1"), F.col("name_b").alias("doc2"))
    # sanity: the distance-2 pair is NOT a direct edge
    direct = {(r["doc1"], r["doc2"]) for r in pairs.collect()}
    assert ("acme corp", "acme corpx.") not in direct
    got = {r["name"]: r["cluster_id"] for r in neardup_clusters(ents, pairs, "name").collect()}
    assert got["acme corp"] == got["acme corp."] == got["acme corpx."] == "acme corp"
    assert got["other thing"] == "other thing"


def test_personalized_pagerank_stays_near_seeds(spark):
    """Two components; seeds in one: the other component gets NO rank
    (sparse frontier), and the seed outranks non-seed neighbors."""
    from is3107datapipelineproject_spark.operators.graph import personalized_pagerank

    pairs = [(0, 1, 1), (1, 2, 1), (10, 11, 1)]  # component A: 0-1-2; B: 10-11
    edges_half = spark.createDataFrame(pairs, ["m1", "m2", "w"])
    edges = undirected_to_directed(edges_half, "m1", "m2", "w")
    seeds = spark.createDataFrame([(0,)], ["node"])
    pr = {r["node"]: r["pr"] for r in personalized_pagerank(edges, seeds, iterations=3).collect()}
    assert set(pr) <= {0, 1, 2}, "rank must never leak into the unreachable component"
    assert 10 not in pr and 11 not in pr
    # 2 only receives half of 1's outflow; 1 also drains back toward the
    # seed, so the far end of the path must rank strictly below the
    # middle (the middle may legitimately out-rank the seed itself —
    # it collects flow from BOTH sides).
    assert pr.get(2, 0) < pr[1]
    assert pr[0] > pr.get(2, 0)


def _two_cliques(spark):
    """Two 4-cliques (nodes 1-4 with heavy weight-5 edges, 11-14 same)
    joined by one weak weight-1 bridge (4, 11)."""
    import itertools

    rows = [(a, b, 5) for a, b in itertools.combinations(range(1, 5), 2)]
    rows += [(a, b, 5) for a, b in itertools.combinations(range(11, 15), 2)]
    rows.append((4, 11, 1))
    pairs = spark.createDataFrame(rows, ["m1", "m2", "w"])
    return undirected_to_directed(pairs, "m1", "m2", "w")


def test_label_propagation_separates_cliques(spark):
    from is3107datapipelineproject_spark.operators.graph import label_propagation

    labels = {r.node: r.label for r in label_propagation(_two_cliques(spark), iterations=2).collect()}
    assert set(labels) == set(range(1, 5)) | set(range(11, 15))
    # each clique collapses to ONE community (min-label tie-break -> 1 and 11)
    assert {labels[n] for n in range(1, 5)} == {1}
    assert {labels[n] for n in range(11, 15)} == {11}


def test_label_propagation_deterministic_across_repartitioning(spark):
    from is3107datapipelineproject_spark.operators.graph import label_propagation

    e = _two_cliques(spark)
    a = sorted((r.node, r.label) for r in label_propagation(e, iterations=2).collect())
    b = sorted((r.node, r.label) for r in label_propagation(e.repartition(7), iterations=2).collect())
    assert a == b


def test_bfs_hops_levels_and_unreachable(spark):
    """Path graph 0-1-2-3-4-5 seeded at 0: hop = node index, capped at
    max_hops; node 5 (4 hops away) must NOT appear. Node 9 is in a
    disjoint component and must not appear either."""
    from is3107datapipelineproject_spark.operators.graph import bfs_hops

    pairs = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(5)] + [(8, 9, 1)], ["m1", "m2", "w"]
    )
    edges = undirected_to_directed(pairs, "m1", "m2", "w")
    seeds = spark.createDataFrame([(0,)], ["node"])
    out = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hops_min_distance_on_cycle(spark):
    """Cycle 0-1-2-3-0: nodes 1 and 3 are both 1 hop from 0, node 2 is
    2 hops (shortest path wins even though a 3-hop route exists)."""
    from is3107datapipelineproject_spark.operators.graph import bfs_hops

    pairs = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 1)], ["m1", "m2", "w"]
    )
    edges = undirected_to_directed(pairs, "m1", "m2", "w")
    seeds = spark.createDataFrame([(0,)], ["node"])
    out = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert out == {0: 0, 1: 1, 3: 1, 2: 2}


def test_kcore_clique_survives_pendants_peel(spark):
    """5-clique (every node degree 4) + a pendant path hanging off node
    0: with k=4 the pendants peel in round 1, which does NOT drag the
    clique below threshold (clique-internal degrees stay 4). Planted
    check of the peel-then-restrict semantics."""
    from is3107datapipelineproject_spark.operators.graph import kcore

    clique = [(a, b, 1) for a in range(5) for b in range(a + 1, 5)]
    pendant = [(0, 10, 1), (10, 11, 1)]
    pairs = spark.createDataFrame(clique + pendant, ["m1", "m2", "w"])
    edges = undirected_to_directed(pairs, "m1", "m2", "w")
    out = {r["node"]: r["degree"] for r in kcore(edges, k=4, rounds=3).collect()}
    assert out == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_kcore_cascading_peel_needs_rounds(spark):
    """Path 0-1-2-3 with k=2: endpoints peel in round 1, which drops
    the middle nodes' degrees, peeling them in round 2 — after 3 rounds
    nothing survives. Verifies the peel actually cascades (a single
    degree filter would wrongly keep nodes 1 and 2)."""
    from is3107datapipelineproject_spark.operators.graph import kcore

    pairs = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1)], ["m1", "m2", "w"]
    )
    edges = undirected_to_directed(pairs, "m1", "m2", "w")
    assert kcore(edges, k=2, rounds=3).count() == 0


def test_bfs_hops_random_vs_bruteforce(spark):
    """Seeded random 40-node graph: distributed level-synchronous BFS
    must equal a plain Python BFS (min-hop, max 3 hops) exactly."""
    import random
    from collections import deque

    from is3107datapipelineproject_spark.operators.graph import bfs_hops

    rng = random.Random(7)
    nodes = list(range(40))
    und = set()
    for _ in range(70):
        a, b = rng.sample(nodes, 2)
        und.add((min(a, b), max(a, b)))
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    dist = {0: 0}
    dq = deque([0])
    while dq:
        u = dq.popleft()
        if dist[u] >= 3:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    pairs = spark.createDataFrame([(a, b, 1) for a, b in sorted(und)], ["m1", "m2", "w"])
    edges = undirected_to_directed(pairs, "m1", "m2", "w")
    seeds = spark.createDataFrame([(0,)], ["node"])
    out = {r["node"]: r["hop"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert out == dist
