"""Blocked fuzzy string matching (entity-resolution shape).

The reference pipeline keys everything on exact author/publication
strings (main_dag.py:151-188); real bibliographic and web-scale corpora
need APPROXIMATE matching — "Goldenrod Lace Spring" vs "goldenrod lace
sprng" are the same entity. The classic scale-safe recipe is

    canonicalize → block → bounded pair-gen → edit-distance gate,

never an all-pairs comparison: the quadratic only ever happens inside a
block, and blocks are capped.

Scale notes (100 TB): step 1 collapses the fact table to DISTINCT
entities before any pairing (one hash aggregate — at crawl scale this is
the difference between 10^12 rows and 10^7 entities). The block
self-join shuffles on the block key only; ``max_block`` drops
pathological blocks (a stop-word first token) the same way
minhash/containment cap hot bands — a dropped block is a *recall*
trade documented in the result, not an OOM. The cheap length pre-gate
(|len(a)-len(b)| ≤ k) runs before the O(len²) Levenshtein so most
candidate pairs never reach the DP; both predicates evaluate inside the
join's residual, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    names: DataFrame,
    name_col: str,
    block_expr: F.Column,
    max_dist: int = 4,
    max_block: int = 10_000,
) -> DataFrame:
    """All pairs of distinct ``name_col`` values within a block whose
    Levenshtein distance is ≤ ``max_dist``.

    ``names`` must already be one row per entity (use a groupBy upstream
    to canonicalize); extra columns ride along and come back suffixed
    ``_a`` / ``_b``. Blocks larger than ``max_block`` are dropped
    entirely (hot-block guard — mirror the same HAVING in any oracle).
    """
    blocked = names.withColumn("_blk", block_expr)
    sizes = blocked.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bn")).filter(F.col("_bn") <= max_block)
    blocked = blocked.join(sizes.select("_blk"), "_blk", "left_semi")

    a = blocked.select([F.col(c).alias(f"{c}_a") for c in blocked.columns if c != "_blk"] + [F.col("_blk")])
    b = blocked.select([F.col(c).alias(f"{c}_b") for c in blocked.columns if c != "_blk"] + [F.col("_blk")])
    na, nb = F.col(f"{name_col}_a"), F.col(f"{name_col}_b")
    pairs = a.join(
        b,
        (a["_blk"] == b["_blk"])
        & (na < nb)
        & (F.abs(F.length(na) - F.length(nb)) <= max_dist)
        & (F.levenshtein(na, nb) <= max_dist),
    )
    return pairs.drop("_blk").withColumn("dist", F.levenshtein(na, nb).cast("int"))
