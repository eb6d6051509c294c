"""Graph / entity-resolution analytics over the star schema.

Two operator classes the rest of the registry lacks:

- ``copurchase_pagerank``: an ITERATIVE join-based graph algorithm
  (fixed-point BIGINT PageRank over the part co-purchase graph) — the
  workload shape GraphX/Pregel lower to, expressed as plain DataFrame
  joins so it is oracle-checkable (the SQL twin unrolls the iterations
  as chained CTEs).
- ``fuzzy_name_match``: a blocked approximate string join
  (canonicalize → block → length gate → Levenshtein), the
  entity-resolution primitive the reference's exact-string keying
  (main_dag.py:151-188) cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators import graph as G
from is3107datapipelineproject_spark.operators.fuzzy import blocked_fuzzy_pairs
from is3107datapipelineproject_spark.operators.pair_counts import pair_counts
from is3107datapipelineproject_spark.sources.tables import load_table
from is3107datapipelineproject_spark.workload.registry import register

_PAGERANK_ITER_SQL = """
it{n} AS (
  SELECT e.dst AS node,
         CAST(150000000 + (85 * CAST(sum((p.pr * e.w) // o.ow) AS BIGINT)) // 100 AS BIGINT) AS pr
  FROM edges e JOIN it{prev} p ON p.node = e.src JOIN outw o ON o.src = e.src
  GROUP BY 1
)"""

_PAGERANK_ORACLE = (
    """
WITH bridge AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS m FROM lineitem),
pairs AS (
  SELECT a.m AS m1, b.m AS m2, CAST(count(*) AS BIGINT) AS w
  FROM bridge a JOIN bridge b ON a.g = b.g AND a.m < b.m GROUP BY 1, 2
),
edges AS (SELECT m1 AS src, m2 AS dst, w FROM pairs
          UNION ALL SELECT m2, m1, w FROM pairs),
outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY 1),
it0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS pr FROM outw),"""
    + ",".join(_PAGERANK_ITER_SQL.format(n=i, prev=i - 1) for i in range(1, 4))
    + """
SELECT node AS part_key, pr AS pr_scaled FROM it3
"""
)


@register("copurchase_pagerank", oracle=_PAGERANK_ORACLE, tags=("graph", "iterative"))
def q_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part importance in the co-purchase graph: parts appearing in the
    same order are linked (weight = #orders), and 3 fixed-point PageRank
    iterations rank them. Pair generation reuses the 2-shuffle
    combination plan (operators/pair_counts.py — never a self-join at
    pair cardinality); each iteration is one rank⋈edge join + one
    aggregate, all-BIGINT so Spark and the unrolled-CTE oracle agree
    bit-for-bit (operators/graph.py determinism contract)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = pair_counts(li, "l_orderkey", "l_partkey")
    edges = G.undirected_to_directed(pairs, "member1", "member2", "cnt")
    pr = G.pagerank(edges, iterations=3)
    return pr.select(F.col("node").alias("part_key"), F.col("pr").alias("pr_scaled"))


_PPR_ITER_SQL = """
it{n} AS (
  SELECT node, pr FROM (
    SELECT COALESCE(f.node, b.node) AS node,
           CAST(COALESCE(f.flow, 0) + COALESCE(b.base, 0) AS BIGINT) AS pr
    FROM (
      SELECT e.dst AS node,
             CAST((85 * CAST(sum((p.pr * e.w) // o.ow) AS BIGINT)) // 100 AS BIGINT) AS flow
      FROM edges e JOIN it{prev} p ON p.node = e.src JOIN outw o ON o.src = e.src
      GROUP BY 1
    ) f FULL OUTER JOIN basev b ON f.node = b.node
  ) WHERE pr > 0
)"""

_PPR_ORACLE = (
    """
WITH bridge AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS m FROM lineitem),
pairs AS (
  SELECT a.m AS m1, b.m AS m2, CAST(count(*) AS BIGINT) AS w
  FROM bridge a JOIN bridge b ON a.g = b.g AND a.m < b.m GROUP BY 1, 2
),
edges AS (SELECT m1 AS src, m2 AS dst, w FROM pairs
          UNION ALL SELECT m2, m1, w FROM pairs),
outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY 1),
seeds AS (SELECT src AS node FROM outw ORDER BY src LIMIT 2),
basev AS (
  SELECT node,
         CAST((CAST(15 AS BIGINT) * 1000000000 * (SELECT count(*) FROM outw))
              // (100 * (SELECT count(*) FROM seeds)) AS BIGINT) AS base
  FROM seeds
),
it0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM seeds),"""
    + ",".join(_PPR_ITER_SQL.format(n=i, prev=i - 1) for i in range(1, 4))
    + """
SELECT node AS part_key, pr AS ppr_scaled FROM it3
"""
)


@register("related_parts_ppr", oracle=_PPR_ORACLE, tags=("graph", "iterative"))
def q_related_parts_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a 2-part anchor set over the
    co-purchase graph (operators/graph.py::personalized_pagerank) — the
    graph-retrieval shape: teleport returns only to the anchors, so
    after 3 iterations the rank vector covers exactly the anchors'
    3-hop neighborhood (sparse by construction at any graph size).
    Fixed-point BIGINT arithmetic; the oracle unrolls the iterations
    with the same full-outer teleport merge."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = pair_counts(li, "l_orderkey", "l_partkey")
    edges = G.undirected_to_directed(pairs, "member1", "member2", "cnt").localCheckpoint(
        eager=True
    )
    seeds = (
        edges.groupBy("src").agg(F.sum("w").alias("_"))
        .orderBy("src")
        .limit(2)
        .select(F.col("src").alias("node"))
    )
    pr = G.personalized_pagerank(edges, seeds, iterations=3)
    return pr.select(F.col("node").alias("part_key"), F.col("pr").alias("ppr_scaled"))


_FUZZY_ORACLE = """
WITH ent AS (
  SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS canon_key,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM part GROUP BY 1
),
blk AS (
  SELECT e.*, split_part(p_name, ' ', 1) AS b FROM ent e
),
ok AS (SELECT b FROM blk GROUP BY 1 HAVING count(*) <= 10000)
SELECT a.p_name AS p_name_a, a.canon_key AS canon_key_a, a.n_parts AS n_parts_a,
       b2.p_name AS p_name_b, b2.canon_key AS canon_key_b, b2.n_parts AS n_parts_b,
       CAST(levenshtein(a.p_name, b2.p_name) AS INTEGER) AS dist
FROM blk a
JOIN blk b2 ON a.b = b2.b AND a.p_name < b2.p_name
           AND abs(length(a.p_name) - length(b2.p_name)) <= 4
           AND levenshtein(a.p_name, b2.p_name) <= 4
WHERE a.b IN (SELECT b FROM ok)
"""


@register("fuzzy_name_match", oracle=_FUZZY_ORACLE, tags=("fuzzy", "entity-resolution"))
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names via blocked Levenshtein join: the part
    fact collapses to distinct name entities FIRST (hash aggregate), the
    quadratic comparison happens only inside first-token blocks (capped
    at 10k — the hot-band guard), and a length pre-gate short-circuits
    the O(len²) DP (operators/fuzzy.py)."""
    part = load_table(spark, sf_dir, "part")
    ents = part.groupBy("p_name").agg(
        F.min("p_partkey").cast("long").alias("canon_key"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    pairs = blocked_fuzzy_pairs(
        ents,
        "p_name",
        block_expr=F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
        max_dist=4,
        max_block=10_000,
    )
    return pairs.select(
        "p_name_a", "canon_key_a", "n_parts_a", "p_name_b", "canon_key_b", "n_parts_b", "dist"
    )


_ER_ORACLE = """
WITH ent AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts FROM part GROUP BY 1),
blk AS (SELECT p_name, split_part(p_name, ' ', 1) AS b FROM ent),
ok AS (SELECT b FROM blk GROUP BY 1 HAVING count(*) <= 10000),
p AS (
  SELECT a.p_name AS n1, b2.p_name AS n2
  FROM blk a
  JOIN blk b2 ON a.b = b2.b AND a.p_name < b2.p_name
             AND abs(length(a.p_name) - length(b2.p_name)) <= 4
             AND levenshtein(a.p_name, b2.p_name) <= 4
  WHERE a.b IN (SELECT b FROM ok)
),
edges AS (SELECT n1 AS src, n2 AS dst FROM p UNION SELECT n2, n1 FROM p),
reach AS (
  WITH RECURSIVE r(id, seen) AS (
    SELECT p_name, p_name FROM ent
    UNION
    SELECT e.dst, r.seen FROM edges e JOIN r ON r.id = e.src
  )
  SELECT * FROM r
),
clusters AS (SELECT id AS p_name, min(seen) AS entity_name FROM reach GROUP BY 1)
SELECT c.p_name, c.entity_name, e.n_parts
FROM clusters c JOIN ent e USING (p_name)
"""


@register("entity_resolution", oracle=_ER_ORACLE, tags=("fuzzy", "entity-resolution", "iterative"))
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: canonicalize part names → blocked
    Levenshtein match (operators/fuzzy.py) → connected components over
    the match graph (operators/dedup.py::neardup_clusters hash-min) →
    every name labeled with its cluster's canonical (min) name. The
    quadratic never leaves a block, the closure is the same iterative
    machinery the dedup family ships, and the oracle replays it with a
    recursive CTE. Singletons (including names in dropped hot blocks)
    resolve to themselves on both engines."""
    from is3107datapipelineproject_spark.operators.dedup import neardup_clusters

    part = load_table(spark, sf_dir, "part")
    ents = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    pairs = blocked_fuzzy_pairs(
        ents.select("p_name"),
        "p_name",
        block_expr=F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
        max_dist=4,
        max_block=10_000,
    ).select(F.col("p_name_a").alias("doc1"), F.col("p_name_b").alias("doc2"))
    clusters = neardup_clusters(ents.select("p_name"), pairs, id_col="p_name")
    return clusters.select(
        "p_name", F.col("cluster_id").alias("entity_name")
    ).join(ents, "p_name")
