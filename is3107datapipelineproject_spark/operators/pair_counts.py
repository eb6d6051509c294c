"""Co-occurrence pair-count — the engine's flagship operator (SURVEY §2.4 A4).

The reference builds a co-authorship pair-count fact with a driver-side
nested loop: for each of C(400,2)=79,800 candidate author pairs it rescans
the whole publication table with a substring-containment test and
group-counts by year (`/root/reference/main_dag.py:265-290`; 12 min 57 s per
the report). That is O(pairs × rows) with false-positive substring
semantics (`main_dag.py:280-281`).

The Spark-first restatement is a *bridge self-join*:

    bridge(group_key, member)          -- one row per (entity, member), distinct
    pairs = bridge a JOIN bridge b
            ON a.group_key = b.group_key AND a.member < b.member
    counts = pairs [JOIN group_attrs] GROUP BY (attrs…, m1, m2) COUNT

One shuffle on ``group_key`` co-locates both join sides; because both
sides are the *same* subplan, Spark reuses the exchange (ReusedExchange)
instead of scanning twice — this is why group attributes (e.g. year) are
attached *after* pairing, not before. The ``<`` predicate emits each
unordered pair once (exact-match semantics, fixing the reference's
substring bug), and the group-count partial-aggregates map-side before
its shuffle.

Scale notes (100 TB): the join key is the *group* (paper / order), so the
shuffle is bounded by bridge-table size, not by the C(n,2) pair space.
Per-group blow-up is quadratic in group size — for web-scale data cap or
salt pathological groups (a paper with 10k "authors") with
``max_group_size``; AQE skew-join splitting handles moderate skew. The
dimension restriction (members limited to a seed list, SURVEY J3/J5) is
applied *before* the self-join so it prunes the shuffle, and broadcast
because the seed dimension is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_counts(
    bridge: DataFrame,
    group_col: str,
    member_col: str,
    group_attrs: DataFrame | None = None,
    members: DataFrame | None = None,
    groups: DataFrame | None = None,
    max_group_size: int | None = None,
) -> DataFrame:
    """Count co-occurrences of unordered ``member`` pairs per group.

    Parameters
    ----------
    bridge: one row per (group, member); duplicates are removed.
    group_attrs: optional dimension keyed by ``group_col`` whose remaining
        columns become extra grouping keys (e.g. publication year) —
        joined at GROUP cardinality (before the pair explosion), never at
        pair cardinality; never force-broadcast (it scales with the fact).
    members: optional tiny dimension (single column named like
        ``member_col``) restricting which members participate — broadcast
        semi-join applied *before* the pair expansion (SURVEY J3+J5).
    groups: optional restriction to a subset of groups (single column
        named like ``group_col``) — semi-joined *before* the quadratic
        pair expansion. This is how "collaborations of member X" queries
        stay scale-safe: pass the (tiny) set of groups containing X and
        ~everything is pruned before the shuffle.
    max_group_size: optional guard dropping pathologically large groups
        before the quadratic expansion (a 10k-author "paper" would emit
        50M pairs; cap or salt such groups).

    Returns ``(cnt, attrs…, member1, member2)`` with ``member1 < member2``.

    Plan shape (2 shuffles total, vs 3+ for the naive distinct+self-join):

    1. groupBy(group) → sorted distinct member array   [shuffle on group]
    2. join group_attrs at group cardinality           [AQE-chosen strategy]
    3. explode array-side combinations (member1 < member2 by sort order)
       — the quadratic blow-up happens in a narrow generator, no join
    4. groupBy(attrs…, member1, member2).count()       [shuffle on pair]
    """
    b = bridge.select(group_col, member_col)

    if members is not None:
        b = b.join(F.broadcast(members.select(member_col).distinct()), member_col, "left_semi")

    if groups is not None:
        b = b.join(groups.select(group_col).distinct(), group_col, "left_semi")

    # One shuffle: distinct members per group, sorted so that combinations
    # emit each unordered pair exactly once with member1 < member2.
    grouped = b.groupBy(group_col).agg(F.sort_array(F.collect_set(member_col)).alias("_ms"))

    if max_group_size is not None:
        grouped = grouped.filter(F.size("_ms") <= max_group_size)

    attr_cols: list[str] = []
    if group_attrs is not None:
        # Joined while still one-row-per-group (cheapest point); plain
        # join — group_attrs scales with the fact table, AQE picks the
        # strategy (broadcast at test scale, SMJ at cluster scale).
        attr_cols = [col for col in group_attrs.columns if col != group_col]
        grouped = grouped.join(group_attrs, group_col, "inner")

    # Narrow quadratic generator: posexplode each sorted member array,
    # then explode the suffix slice after each position — C(n,2) pairs
    # per group from two codegen Generate operators. (r12, guide §1.2
    # step 2: the previous single-explode shape built the pair list with
    # nested interpreted ``transform`` lambdas and a fresh ``slice``
    # allocation per outer element; two explodes keep the whole
    # generator in whole-stage codegen — JVM-CPU A/B at sf0.1 on the
    # lineitem bridge: 3.84 → 2.38 s CPU / 1.37 → 1.00 s wall for the
    # full pair+count pipeline, output multiset identical. Both exploded
    # siblings (``_ms``, ``member1``) are plain attributes, so the
    # explode-sibling re-evaluation lint shape never arises.)
    step1 = grouped.select(
        *attr_cols, "_ms", F.posexplode("_ms").alias("_i", "member1")
    )
    pairs = step1.select(
        *attr_cols,
        "member1",
        F.explode(
            F.slice(
                "_ms",
                F.col("_i") + 2,
                F.greatest(F.size("_ms") - F.col("_i") - 1, F.lit(0)),
            )
        ).alias("member2"),
    )
    return pairs.groupBy(*attr_cols, "member1", "member2").agg(F.count(F.lit(1)).alias("cnt"))


def supplier_pair_counts(
    lineitem: DataFrame, orders: DataFrame, with_member: int | None = None
) -> DataFrame:
    """The testdata instantiation of the DBLP co-authorship fact:
    suppliers co-occurring on an order ≈ authors co-occurring on a paper
    (FIXTURES.md §A mapping), yearly by order date.

    Shape: distinct (order, supplier) bridge → self-join (exchange reused
    across both sides) → year lookup → group-count.

    ``with_member`` prunes the bridge to groups containing that member
    *before* the quadratic self-join (the scale-safe plan for Proxy
    Q3/Q4 "collaborations of X" — docx §Proxy Queries).
    """
    bridge = lineitem.select("l_orderkey", "l_suppkey")
    years = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.year("o_orderdate").cast("int").alias("year"),
    )
    groups = None
    if with_member is not None:
        groups = bridge.filter(F.col("l_suppkey") == with_member).select("l_orderkey")
    out = pair_counts(bridge, "l_orderkey", "l_suppkey", group_attrs=years, groups=groups)
    return out.select(
        F.col("cnt"),
        F.col("year"),
        F.col("member1").alias("author1"),
        F.col("member2").alias("author2"),
    )
