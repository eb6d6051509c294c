"""Query registry: every operator from SURVEY.md §2 registers here as a
(name, spark-callable, DuckDB-oracle-SQL) triple.

The driver contract (``__spark_entry__.py``) runs each callable at
sf=0.01 and compares row-count + schema + order-insensitive value hash
against the oracle SQL executed by DuckDB on the same parquet files.
Column names AND types must therefore match exactly between the two —
alias every computed column on both sides, and pin integer widths with
explicit casts (Spark ``count()`` is BIGINT; DuckDB ``year()`` is BIGINT
where Spark's is INT, etc.).

Queries with no SQL-expressible twin (stateful streaming, approximate
sketches) register with ``oracle=None`` → the driver records a weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):  # decorator
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


# --- split-structure probes (round 12, per the round-11 verdict) -------
#
# The driver's oracle comparison certifies AGREEMENT, not non-triviality:
# incremental_blocked_jaccard's first registration split batches on
# doc_id % 5 while the testdata assigns source = src(doc_id % 20) — every
# block landed entirely on one side, both engines returned 0 rows, and
# the query would have stayed green forever. The round-11 guard
# (every oracle non-empty at sf0.01) catches an EMPTY output; it cannot
# catch a split query whose output is non-empty while one side (or the
# crossing structure) is degenerate. So every incremental / split /
# holdout / sampling registration also carries a SPLIT PROBE: a callable
# (spark, sf_dir) -> dict of named structural counts — each side's size
# plus a crossing witness (shared blocks, candidate pairs, held-out
# hits, rejected arrivals, dropped sample rows …). The registry test
# asserts EVERY count ≥ 1 at sf0.01, and a meta-test forces any new
# registration whose name matches the family pattern to add a probe.

SplitProbeFn = Callable[[SparkSession, str], dict]

SPLIT_PROBES: dict[str, SplitProbeFn] = {}


def split_probe(name: str):  # decorator, mirrors register()
    def deco(fn: SplitProbeFn) -> SplitProbeFn:
        if name in SPLIT_PROBES:
            raise ValueError(f"duplicate split probe: {name}")
        SPLIT_PROBES[name] = fn
        return fn

    return deco


def split_probes() -> dict[str, SplitProbeFn]:
    """All registered split probes (loads the probe module)."""
    _ensure_loaded()
    from is3107datapipelineproject_spark.workload import split_probes as _sp  # noqa: F401

    return dict(SPLIT_PROBES)


# Queries with the thinnest external-correctness evidence go first so a
# prefix sample of the registry exercises them before the repeatedly
# checked core.  Ordering is presentation-only: every query is registered
# exactly once and the full dict always contains all of them.
#
# STANDING RULE (round-7, per the round-6 verdict): the driver samples
# the FIRST 50 entries each round, so a round may add at most
# (50 − #never-sampled-backlog − #edited-this-round) new queries — the
# registry must never again outgrow the evidence window.
#
# AGE-ROTATION RULE (round-8, per the round-7 verdict): with the
# never-sampled backlog at zero, the window rotates by verification AGE —
# (1) queries whose plans/code paths were EDITED since their last green
# row lead (their old evidence is stale), then (2) all other queries
# ordered by last-driver-verified round ASCENDING, ties alphabetical,
# truncated to the 50-slot window. `tools/evidence_gap.py --rotation`
# computes the ordering mechanically from CORRECTNESS_r*.json; regenerate
# the list below each round. Round-11 window: 1 edited (ngram_jaccard,
# reworked plan) + 1 new (incremental_blocked_jaccard) + the 2 r4 rows
# the round-10 truncation deferred + 46 of the 47-row r5 cohort —
# exactly 50 slots, no truncation; zipf_slope (the r5 alphabetical
# tail) heads r12 with the r6 cohort. The other round-11 code paths
# (purge crash-window fixes, blocked_ingest_sink, mergeSchema reads)
# live on pytest-only sink paths and stale no registered plan.
_EVIDENCE_PRIORITY: tuple[str, ...] = (
    # --- plan edited in round 11 -> re-sample first (1):
    # ngram_jaccard's blocked_jaccard_pairs was reworked from a raw
    # within-block self-join to PPJoin prefix filtering on the
    # composite (block, token) key (the round-10 verdict's one
    # scale-killer); its r8 green row predates the new plan ---
    "ngram_jaccard",
    # --- new in round 11: no external evidence yet (1) ---
    "incremental_blocked_jaccard",
    # --- last driver-verified in r4 (displaced by the r10 window's
    # truncation; the round-10 verdict directed them to lead r11) (2) ---
    "window_rank_dense",
    "xml_flatten",
    # --- last driver-verified in r5 (oldest-first rotation, 46 of 47 —
    # exactly filling the 50-slot window; zipf_slope, the alphabetical
    # tail of the r5 cohort, plus the r6 cohort head r12) ---
    "ab_test_summary",
    "bigram_surprisal",
    "blocklist_filter",
    "bloom_contamination",
    "bm25_search",
    "boilerplate_flag",
    "bpe_merge_candidates",
    "char_entropy",
    "containment_pairs",
    "copurchase_triangles",
    "corpus_diff",
    "corpus_drift",
    "corpus_shuffle",
    "cosine_topk",
    "daily_anomaly_zscore",
    "data_card",
    "decontaminate_fixed_bench",
    "dup_cluster_sizes",
    "dup_ngram_fraction",
    "embedding_abtt",
    "embedding_neardup_lsh",
    "embedding_pc_projection",
    "embedding_top_pc",
    "entity_resolution",
    "fuzzy_name_match",
    "gap_fill_interpolate",
    "graph_degree_stats",
    "hard_negatives",
    "incremental_curation",
    "kmeans_assign",
    "kmeans_assign_hier",
    "minhash_topk_similar",
    "numeric_corr",
    "pretrain_pipeline",
    "priority_sample",
    "quality_classifier",
    "quantile_sketch",
    "readability_score",
    "running_distinct_users",
    "semantic_dedup",
    "session_transition_matrix",
    "simhash_neardup",
    "similar_parts_jaccard",
    "temperature_sample",
    "vocab_growth",
    "word_pmi",
)


def _ordered() -> dict[str, QuerySpec]:
    _ensure_loaded()
    first = {n: REGISTRY[n] for n in _EVIDENCE_PRIORITY if n in REGISTRY}
    rest = {n: s for n, s in REGISTRY.items() if n not in first}
    return {**first, **rest}


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from is3107datapipelineproject_spark.workload import (  # noqa: F401
        curation_queries,
        domain_queries,
        graph_queries,
        llm_queries,
        quality_queries,
        star_queries,
        tpch_queries,
        window_queries,
    )

    _LOADED = True
