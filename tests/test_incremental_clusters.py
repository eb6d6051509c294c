"""Planted fixtures + seeded fuzz for incremental connected-components
maintenance (operators/dedup.py::incremental_cluster_update) — the
standing boundary-fixture rule applied to the cluster-contraction join:
every structural hazard of incremental CC is planted explicitly (two
old clusters merged through one new doc, the root DECREASING below
every old label, a new×new chain bridging two old clusters, untouched
clusters staying bit-identical), plus a seeded random-graph fuzz that
asserts incremental == one-shot on arbitrary topologies.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.dedup import (
    incremental_cluster_update,
    neardup_clusters,
)


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "doc1 bigint, doc2 bigint"
    )


def _labels(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def _oneshot(spark, ids, pairs):
    return _labels(neardup_clusters(_nodes(spark, ids), _edges(spark, pairs), "doc_id"))


def test_merge_two_old_clusters_via_one_new_doc(spark):
    # old clusters {1,2} (label 1) and {5,6} (label 5); new doc 9 links both
    old_ids, old_e = [1, 2, 5, 6], [(1, 2), (5, 6)]
    old_labels = neardup_clusters(_nodes(spark, old_ids), _edges(spark, old_e), "doc_id")
    out = _labels(
        incremental_cluster_update(
            old_labels, _nodes(spark, [9]), _edges(spark, [(9, 2), (9, 6)])
        )
    )
    assert out == {1: 1, 2: 1, 5: 1, 6: 1, 9: 1}
    assert out == _oneshot(spark, old_ids + [9], old_e + [(9, 2), (9, 6)])


def test_root_decreases_below_every_old_label(spark):
    # the hazard a naive "labels only grow clusters" update misses: the
    # arriving id 0 is SMALLER than the old cluster's label, so every
    # old member must relabel DOWN.
    old_ids, old_e = [3, 4, 7], [(3, 4), (4, 7)]
    old_labels = neardup_clusters(_nodes(spark, old_ids), _edges(spark, old_e), "doc_id")
    out = _labels(
        incremental_cluster_update(
            old_labels, _nodes(spark, [0]), _edges(spark, [(0, 7)])
        )
    )
    assert out == {0: 0, 3: 0, 4: 0, 7: 0}


def test_new_new_chain_bridges_two_old_clusters(spark):
    # new docs 10-11 share an edge; 10 touches cluster {1,2}, 11 touches
    # {5,6}: all six ids must land in one component through the chain.
    old_ids, old_e = [1, 2, 5, 6], [(1, 2), (5, 6)]
    old_labels = neardup_clusters(_nodes(spark, old_ids), _edges(spark, old_e), "doc_id")
    new_e = [(10, 1), (11, 5), (10, 11)]
    out = _labels(
        incremental_cluster_update(old_labels, _nodes(spark, [10, 11]), _edges(spark, new_e))
    )
    assert out == {1: 1, 2: 1, 5: 1, 6: 1, 10: 1, 11: 1}
    assert out == _oneshot(spark, old_ids + [10, 11], old_e + new_e)


def test_untouched_cluster_and_singleton_batch(spark):
    # cluster {5,6} has no incident new edge -> labels bit-identical;
    # new doc 12 arrives edge-free -> singleton labelled by itself.
    old_ids, old_e = [1, 2, 5, 6], [(1, 2), (5, 6)]
    old_labels = neardup_clusters(_nodes(spark, old_ids), _edges(spark, old_e), "doc_id")
    out = _labels(
        incremental_cluster_update(
            old_labels, _nodes(spark, [9, 12]), _edges(spark, [(9, 2)])
        )
    )
    assert out == {1: 1, 2: 1, 5: 5, 6: 5, 9: 1, 12: 12}


def test_empty_batch_and_empty_edges_are_identity(spark):
    old_ids, old_e = [1, 2, 5], [(1, 2)]
    old_labels = neardup_clusters(_nodes(spark, old_ids), _edges(spark, old_e), "doc_id")
    out = _labels(incremental_cluster_update(old_labels, _nodes(spark, []), _edges(spark, [])))
    assert out == {1: 1, 2: 1, 5: 5}


def test_delta_only_is_exactly_changed_plus_batch(spark):
    old_ids, old_e = [1, 2, 5, 6], [(1, 2), (5, 6)]
    old_labels = neardup_clusters(_nodes(spark, old_ids), _edges(spark, old_e), "doc_id")
    delta = _labels(
        incremental_cluster_update(
            old_labels,
            _nodes(spark, [0, 12]),
            _edges(spark, [(0, 5)]),
            delta_only=True,
        )
    )
    # {5,6} relabel to 0 (changed), batch rows 0 and 12 appear; the
    # untouched cluster {1,2} must NOT be in the delta.
    assert delta == {5: 0, 6: 0, 0: 0, 12: 12}


def test_fuzz_incremental_equals_oneshot(spark):
    """Seeded random graphs: split nodes 20/80 into batch/corpus, feed
    the corpus-only closure plus every batch-incident edge through the
    contraction, and demand the one-shot labelling exactly. Seeds are
    independent, and each seed's cost is fixpoint-loop JOB OVERHEAD on
    tiny frames, so they run through a small driver thread pool
    (optimization guide §2.6: concurrent jobs back-fill each other's
    stragglers; job submission is thread-safe) — same 12 seeds, same
    asserts, ~4x less wall for the suite's slowest test."""

    def one_seed(seed: int) -> None:
        rng = random.Random(seed)
        n = rng.randint(6, 40)
        ids = list(range(n))
        m = rng.randint(0, 2 * n)
        pairs = sorted(
            {
                (a, b)
                for a, b in (
                    sorted(rng.sample(ids, 2)) for _ in range(m)
                )
            }
        )
        batch = {i for i in ids if i % 5 == 0}
        old_ids = [i for i in ids if i not in batch]
        old_e = [(a, b) for a, b in pairs if a not in batch and b not in batch]
        new_e = [(a, b) for a, b in pairs if a in batch or b in batch]
        old_labels = neardup_clusters(
            _nodes(spark, old_ids), _edges(spark, old_e), "doc_id"
        )
        got = _labels(
            incremental_cluster_update(
                old_labels, _nodes(spark, sorted(batch)), _edges(spark, new_e)
            )
        )
        want = _oneshot(spark, ids, pairs)
        assert got == want, f"seed={seed}"

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(one_seed, range(12)))


def test_corpus_label_table_never_shuffles(spark):
    """Scale-shape guard: the physical plan touching the corpus label
    frame must reach it through broadcast joins only — no Exchange may
    repartition the label table itself (its only exchanges are the
    tiny contracted-graph fixpoint's)."""
    old_ids, old_e = list(range(1, 101)), [(i, i + 1) for i in range(1, 100, 2)]
    old_labels = neardup_clusters(
        _nodes(spark, old_ids), _edges(spark, old_e), "doc_id"
    ).localCheckpoint(eager=True)
    out = incremental_cluster_update(
        old_labels, _nodes(spark, [0]), _edges(spark, [(0, 1)])
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the relabel and endpoint-resolution joins must be broadcast-hash
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- deletion-aware retraction (retract_from_cluster_state) -----------------


def _pairs_among(edges_df):
    """pairs_fn seam: restrict a global edge list to pairs whose BOTH
    endpoints are in the given doc frame (what re-derivation over the
    affected survivors produces, since old_labels is that edge set's
    closure)."""

    def fn(df):
        ids = df.select(F.col("doc_id"))
        return (
            edges_df.join(
                ids.withColumnRenamed("doc_id", "doc1"), "doc1", "left_semi"
            ).join(ids.withColumnRenamed("doc_id", "doc2"), "doc2", "left_semi")
        )

    return fn


def _retract(spark, ids, pairs, deleted):
    from is3107datapipelineproject_spark.operators.dedup import (
        retract_from_cluster_state,
    )

    docs = _nodes(spark, ids)
    edges = _edges(spark, pairs)
    labels = neardup_clusters(docs, edges, "doc_id")
    return _labels(
        retract_from_cluster_state(
            docs,
            labels,
            _nodes(spark, deleted),
            pairs_fn=_pairs_among(edges),
        )
    )


def test_bridge_deletion_splits_cluster(spark):
    # 1-2-3 chained through 2; deleting the bridge must SPLIT {1,3}
    out = _retract(spark, [1, 2, 3, 7], [(1, 2), (2, 3)], deleted=[2])
    assert out == {1: 1, 3: 3, 7: 7}


def test_min_id_label_owner_deletion_relabels(spark):
    # {1,2,3} fully connected without 1? edges (1,2),(1,3),(2,3): delete
    # the label owner 1 — survivors stay connected, new label = 2
    out = _retract(spark, [1, 2, 3], [(1, 2), (1, 3), (2, 3)], deleted=[1])
    assert out == {2: 2, 3: 2}


def test_whole_cluster_deletion_disappears(spark):
    out = _retract(spark, [1, 2, 5, 6], [(1, 2), (5, 6)], deleted=[5, 6])
    assert out == {1: 1, 2: 1}


def test_untouched_clusters_bit_identical(spark):
    out = _retract(spark, [1, 2, 5, 6, 9], [(1, 2), (5, 6)], deleted=[9])
    assert out == {1: 1, 2: 1, 5: 5, 6: 5}


def test_retract_fuzz_equals_oneshot_over_survivors(spark):
    """Same thread-pool shape as test_fuzz_incremental_equals_oneshot:
    independent seeds of job-overhead-bound fixpoints overlap."""

    def one_seed(seed: int) -> None:
        rng = random.Random(1000 + seed)
        n = rng.randint(6, 36)
        ids = list(range(n))
        pairs = sorted(
            {
                (a, b)
                for a, b in (sorted(rng.sample(ids, 2)) for _ in range(2 * n))
            }
        )
        deleted = [i for i in ids if i % 7 == 2]
        got = _retract(spark, ids, pairs, deleted)
        kept = [i for i in ids if i % 7 != 2]
        kept_pairs = [
            (a, b) for a, b in pairs if a % 7 != 2 and b % 7 != 2
        ]
        want = _oneshot(spark, kept, kept_pairs)
        assert got == want, f"seed={seed}"

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(one_seed, range(10)))


def test_retract_end_to_end_minhash(spark):
    """Default pair re-derivation (MinHash over text): deleting docs
    from a corpus with planted duplicate groups leaves labels equal to
    the one-shot over the survivors."""
    from is3107datapipelineproject_spark.operators.dedup import (
        minhash_neardup_pairs,
        retract_from_cluster_state,
    )

    ta = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    tb = "one two three four five six seven eight nine ten eleven twelve thirteen"
    tc = "red orange yellow green blue indigo violet crimson amber teal navy plum"
    rows = [(1, ta), (2, ta), (3, ta), (5, tb), (6, tb), (9, tc)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    labels = neardup_clusters(
        docs, minhash_neardup_pairs(docs, "text", "doc_id"), "doc_id"
    )
    out = retract_from_cluster_state(
        docs, labels, _nodes(spark, [1, 5])  # delete a label owner + half a pair
    )
    surv = docs.filter(~F.col("doc_id").isin([1, 5]))
    want = {
        (r.doc_id, r.cluster_id)
        for r in neardup_clusters(
            surv, minhash_neardup_pairs(surv, "text", "doc_id"), "doc_id"
        ).collect()
    }
    assert {(r.doc_id, r.cluster_id) for r in out.collect()} == want
    assert (2, 2) in want and (3, 2) in want and (6, 6) in want
