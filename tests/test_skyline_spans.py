"""Planted-case tests for the round-5 additions: the distributed 2-D
skyline sweep (workload/tpch_queries.py::q_skyline_parts) and exact
repeated-span detection (workload/curation_queries.py::q_repeated_spans).

Oracle parity at sf0.01 validates both against an independent SQL
strategy; these tests pin the EDGE semantics oracle data may not
exercise — frontier ties/duplicates for the skyline, stride alignment
for the spans."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _skyline(spark, rows):
    """Run the registered skyline query against an in-memory part table
    by writing it as a tiny parquet dir shaped like testdata."""
    import tempfile

    from is3107datapipelineproject_spark.workload.registry import queries

    d = tempfile.mkdtemp(prefix="skyline_")
    df = spark.createDataFrame(
        [(k, "n", "b", "t", s, p) for (k, p, s) in rows],
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    out = queries()["skyline_parts"](spark, d)
    return sorted((r["p_partkey"]) for r in out.collect())


def test_skyline_basic_dominance(spark):
    # (key, price, size): 1 dominates 3 (cheaper, smaller); 1 and 2 are
    # mutually non-dominated (trade-off); 4 dominated by 2 on price tie
    # is NOT the case here — 4 loses to 1 outright.
    rows = [(1, 10.0, 5), (2, 5.0, 9), (3, 12.0, 6), (4, 11.0, 5)]
    assert _skyline(spark, rows) == [1, 2]


def test_skyline_price_tie_strict_size(spark):
    # Same price, smaller size dominates: 2 beats 1. 3 survives as the
    # cheap-but-big corner.
    rows = [(1, 10.0, 7), (2, 10.0, 4), (3, 6.0, 9)]
    assert _skyline(spark, rows) == [2, 3]


def test_skyline_exact_duplicates_both_survive(spark):
    # Equal (price, size) points do not dominate each other (dominance
    # needs one strict inequality) — both frontier copies must appear.
    rows = [(1, 10.0, 5), (2, 10.0, 5), (3, 20.0, 4)]
    assert _skyline(spark, rows) == [1, 2, 3]


def test_repeated_spans_alignment_guarantee(spark):
    """The two copies of the shared region sit at DIFFERENT character
    offsets (doc 1 has an 'AAA ' prefix) — a fixed position-stride
    window grid would never align across them and miss the repeat
    entirely (the bug this test originally caught). Content-defined
    anchors ('fox' starts an anchored token inside the region with
    >= W chars left) must catch it at any offset. A same-doc repeat
    must NOT count (n_docs >= 2 is cross-document)."""
    import tempfile

    from is3107datapipelineproject_spark.workload.registry import queries

    d = tempfile.mkdtemp(prefix="spans_")
    shared = "the quick brown fox jumps over the lazy dog once"  # 48 chars
    df = spark.createDataFrame(
        [
            (1, "AAA " + shared + " tail one", "en", "s1", 0),
            (2, shared + " completely different ending", "en", "s2", 0),
            (3, "zz " + ("selfrepeat" * 8) + " " + ("selfrepeat" * 8), "en", "s3", 0),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = queries()["repeated_spans"](spark, d).collect()
    # every surviving span must come from >= 2 docs
    assert all(r["n_docs"] >= 2 for r in out)
    # the planted cross-doc repeat is found
    assert any(shared.find(r["span"].strip()) >= 0 or r["span"] in ("AAA " + shared) for r in out)
    # doc 3's self-repeat alone never produces a row (its spans exist in one doc)
    assert all("selfrepeat" not in r["span"] for r in out)


def test_skyline_random_vs_bruteforce(spark):
    """200 seeded random points: the distributed sweep must equal the
    O(n²) dominance definition computed in plain Python."""
    import random

    rng = random.Random(42)
    rows = [
        (i, float(rng.randint(1, 40)), rng.randint(1, 40)) for i in range(200)
    ]

    def dominated(a, b):  # b dominates a
        return (
            b[1] <= a[1]
            and b[2] <= a[2]
            and (b[1] < a[1] or b[2] < a[2])
        )

    expect = sorted(
        r[0] for r in rows if not any(dominated(r, o) for o in rows)
    )
    assert _skyline(spark, rows) == expect


def test_mixture_allocation_invariants(spark):
    """Budget-feasibility invariants on the registered water-filling
    planner at sf0.001: no source exceeds its capacity, the total never
    exceeds the 60% budget, and round 2 leaves at most (n_sources - 1)
    integer-floor slack when some source is capped (exact fill is
    impossible only by flooring)."""
    from is3107datapipelineproject_spark.workload.registry import queries

    out = queries()["mixture_allocation"](spark, "/root/testdata/sf0.001").collect()
    total_cap = sum(r["cap"] for r in out)
    budget = (6 * total_cap) // 10
    assert all(0 <= r["alloc"] <= r["cap"] for r in out)
    assert sum(r["alloc"] for r in out) <= budget


def test_skyline_nd_random_vs_bruteforce(spark):
    """300 seeded random 3-D points across 8 partitions (forcing
    multi-batch, multi-partition folding): the two-phase distributed
    skyline must equal the O(n²) dominance definition."""
    import random

    from is3107datapipelineproject_spark.operators.skyline import skyline_nd

    rng = random.Random(99)
    rows = [
        (i, float(rng.randint(0, 15)), float(rng.randint(0, 15)), float(rng.randint(0, 15)))
        for i in range(300)
    ]

    def dominated(a, b):
        return all(b[j] <= a[j] for j in (1, 2, 3)) and any(b[j] < a[j] for j in (1, 2, 3))

    expect = sorted(r[0] for r in rows if not any(dominated(r, o) for o in rows))
    df = spark.createDataFrame(rows, ["vec_id", "d0", "d1", "d2"]).repartition(8)
    got = sorted(r["vec_id"] for r in skyline_nd(df, "vec_id", ["d0", "d1", "d2"]).collect())
    assert got == expect


def test_skyline_nd_duplicates_survive(spark):
    """Identical frontier points do not dominate each other — all
    copies must appear (matches the NOT-EXISTS oracle semantics)."""
    from is3107datapipelineproject_spark.operators.skyline import skyline_nd

    rows = [(1, 1.0, 1.0, 1.0), (2, 1.0, 1.0, 1.0), (3, 2.0, 2.0, 2.0)]
    df = spark.createDataFrame(rows, ["vec_id", "d0", "d1", "d2"]).repartition(3)
    got = sorted(r["vec_id"] for r in skyline_nd(df, "vec_id", ["d0", "d1", "d2"]).collect())
    assert got == [1, 2]
