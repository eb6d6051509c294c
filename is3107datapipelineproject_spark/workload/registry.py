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


# Queries with the thinnest external-correctness evidence go first so a
# prefix sample of the registry exercises them before the repeatedly
# checked core.  Ordering is presentation-only: every query is registered
# exactly once and the full dict always contains all of them.
#
# STANDING RULE (round-7, per the round-6 verdict): the driver samples
# the FIRST 50 entries each round, so a round may add at most
# (50 − #never-sampled-backlog − #edited-this-round) new queries — the
# registry must never again outgrow the evidence window. Round-7 budget:
# 38 backlog + 5 re-samples (plans changed this round) leaves ≤7 new;
# 5 were added (window = 48/50, verified by tools/evidence_gap.py:
# never-sampled 43, all inside the window, 0 red).
#
# Round-7 window: positions 1-38 are the 38 round-6 session-2/3 queries
# never driver-sampled in r1-r6 (all locally oracle-green in the round-6
# full rehearsal); then the 5 queries whose PLANS changed in round 7
# after their last green row (ntile decimal idiv + distributed-rank
# totals checkpoint; bfs/ppr shuffle_hash pins); then round-7 additions.
# Union of CORRECTNESS_r01-r06 covers every other registered query.
_EVIDENCE_PRIORITY: tuple[str, ...] = (
    # --- never driver-sampled in r1-r6 (38) ---------------------------
    "ewma_daily_revenue",
    "autocorr_daily_revenue",
    "cluster_silhouette",
    "multimodal_exact_dedup",
    "fact_bucket_build",
    "bucketed_join_revenue",
    "zorder_events_box",
    "bpe_learn_merges",
    "ks_test_priority_revenue",
    "kmv_source_overlap",
    "dpp_modern_era_revenue",
    "ols_price_qty_discount",
    "bloom_join_brand_qty",
    "bpe_token_fertility",
    "time_to_convert_quantiles",
    "classifier_calibration",
    "winsorized_revenue_stats",
    "quality_auc",
    "precision_recall_curve",
    "multiplier_bootstrap_ci",
    "kneser_ney_bigram",
    "fk_integrity_audit",
    "trend_robust_stats",
    "group_exact_percentiles",
    "stream_static_enrich",
    "markov_next_event_accuracy",
    "mmr_rerank",
    "join_cardinality_estimate",
    "embedding_release_drift",
    "rrf_fusion",
    "conformal_price_interval",
    "revenue_moments",
    "deletion_cascade_audit",
    "funnel_dropoff_significance",
    "subgroup_auc_audit",
    "order_total_reconciliation",
    "cohort_ltv_curve",
    "ivf_probe_sweep",
    # --- plans changed in round 7 after their last green row (5) ------
    "window_ntile_cume",
    "rfm_segmentation",
    "revenue_gini",
    "copurchase_bfs_hops",
    "related_parts_ppr",
    # --- new in round 7: no external evidence yet ----------------------
    "bfs_from_edges",
    "ppr_from_edges",
    "ann_index_append",
    "dblp_pair_lookup",
    "pagerank_from_merged_edges",
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
