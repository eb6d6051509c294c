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
# the list below each round. Round-12 window: 3 edited (the durable
# materialization flag touched ngram_jaccard's and
# prefix_filter_jaccard's operator bodies; incremental_blocked_jaccard
# gained its one-block-per-doc guard) + zipf_slope (the last r5 row) +
# the full 45-query r6 cohort + the 2 alphabetical heads of the r7
# cohort — exactly 50 slots. After this window lands, no green row
# predates r6 and the r7 cohort (45 remaining) heads round 13. The
# other round-12 code paths (sink guards, reader-mode recovery,
# purge-intent orphan check) live on pytest-only sink paths and stale
# no registered plan.
_EVIDENCE_PRIORITY: tuple[str, ...] = (
    # --- plans/code paths edited in round 12 -> re-sample first (3):
    # ngram_jaccard + prefix_filter_jaccard gained the durable
    # materialization flag (default path unchanged but the operator
    # bodies were edited); incremental_blocked_jaccard gained the
    # one-block-per-doc loud guard ---
    "ngram_jaccard",
    "prefix_filter_jaccard",
    "incremental_blocked_jaccard",
    # --- oldest-first rotation: zipf_slope (the single r5 row), the
    # full 45-query r6 cohort, and the two alphabetical heads of the
    # r7 cohort — exactly filling the 50-slot window (the rest of r7
    # heads round 13). Generated by tools/evidence_gap.py --rotation ---
    "zipf_slope",
    "activity_streaks",
    "ann_index_build",
    "approx_percentile_tdigest",
    "association_rules",
    "bulk_part_suppliers",
    "chi2_terms",
    "clustering_coefficient",
    "copurchase_communities",
    "copurchase_kcore",
    "copurchase_pagerank",
    "cusum_changepoint",
    "discount_revenue",
    "dq_constraints",
    "embedding_skyline",
    "grouping_sets_revenue",
    "incremental_prefix_jaccard",
    "ivfpq_topk",
    "ivfpq_topk_from_index",
    "kcore_from_edges",
    "mixture_allocation",
    "mode_median_stats",
    "naive_bayes_confusion",
    "nested_subsets",
    "ols_price_by_qty",
    "pagerank_from_edges",
    "part_supplier_variety",
    "pq_codes",
    "pq_recall",
    "pq_topk",
    "priority_by_linestatus",
    "repeated_spans",
    "scd2_asof_lookup",
    "scd2_order_priority",
    "seasonal_decompose_dow",
    "session_overlap_join",
    "significant_parts",
    "skyline_parts",
    "sole_returned_supplier",
    "source_overlap",
    "sql_interface_revenue",
    "time_weighted_avg",
    "top_conversion_paths",
    "vocab_coverage",
    "window_time_range_avg",
    "asof_join",
    "autocorr_daily_revenue",
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
