"""Iterative graph analytics on co-occurrence edges.

The reference's collaboration workload (main_dag.py:275-283) stops at
pair COUNTS; a training-data pipeline also wants node IMPORTANCE over
the induced graph (e.g. weighting sources/authors by centrality when
assembling a mixture). ``pagerank`` is the canonical join-based
iterative workload: each iteration is one equi-join of the rank vector
with the edge list (both hash-partitioned on the source key) plus one
aggregate by destination — the exact shape Pregel/GraphX lower to, kept
here in plain DataFrame ops so Catalyst/AQE manage the physical plan.

Determinism contract: ranks are BIGINT fixed-point (scaled by
``SCALE``), every division is integer ``div``, and every sum is an
integer sum — commutative and exact, so the result is bit-identical
regardless of partitioning or aggregation order, and a SQL engine
running the unrolled iterations agrees hash-for-hash. (A float
implementation would diverge across engines in the last ulp and is not
oracle-checkable.)

Scale notes (100 TB): edges are shuffled on ``src`` once into
``edge_norm`` (out-weight pre-joined, so the loop body never touches the
degree table again); each iteration re-shuffles only the O(|V|) rank
vector, never the O(|E|) edge list — with AQE the edge side of the
per-iteration join reuses its exchange. Fixed iteration count keeps the
lineage bounded; for deep iteration counts checkpoint every ~10 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # fixed-point: rank 1.0 == 10^9


def undirected_to_directed(pairs: DataFrame, m1: str, m2: str, w: str) -> DataFrame:
    """Expand unordered weighted pairs (m1 < m2) into both directed arcs."""
    fwd = pairs.select(F.col(m1).alias("src"), F.col(m2).alias("dst"), F.col(w).alias("w"))
    rev = pairs.select(F.col(m2).alias("src"), F.col(m1).alias("dst"), F.col(w).alias("w"))
    return fwd.unionByName(rev)


def pagerank(edges: DataFrame, iterations: int = 3, damping_pct: int = 85) -> DataFrame:
    """Weighted PageRank over directed ``(src, dst, w)`` edges.

    Every node present as a source participates; with symmetric input
    (see :func:`undirected_to_directed`) there are no dangling nodes, so
    no mass-leak correction term is needed. Returns ``(node, pr)`` with
    ``pr`` in SCALE fixed-point.

    pr'(v) = (1-d)·SCALE + d · Σ_{(u,v,w)} (pr(u)·w) div out_w(u),
    all in BIGINT arithmetic (see module docstring).
    """
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("ow"))
    # Pre-join the normalizer once: the loop body is then a single
    # join + aggregate per iteration.
    edge_norm = edges.join(outw, "src").select("src", "dst", "w", "ow")

    pr = outw.select(F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("pr"))
    base = (100 - damping_pct) * SCALE // 100
    for _ in range(iterations):
        pr = (
            edge_norm.join(pr, edge_norm["src"] == pr["node"])
            .groupBy("dst")
            .agg(F.expr("sum((pr * w) div ow)").cast("long").alias("_s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(base).cast("long") + F.expr(f"({damping_pct} * _s) div 100")).alias("pr"),
            )
        )
    return pr
