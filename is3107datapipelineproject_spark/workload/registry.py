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
# Round-5 window: positions 1-30 are the 30 queries that have never been
# driver-sampled in any round (r1-r4 covered the other 135); positions
# 31-33 are the three operators whose code changed in round 4 AFTER their
# last green sample; the remainder of the 50-slot window holds queries
# added this round (no external evidence yet by definition).
_EVIDENCE_PRIORITY: tuple[str, ...] = (
    # --- never driver-sampled in r1-r4 (30) ---------------------------
    "bigram_surprisal",
    "blocklist_filter",
    "bloom_contamination",
    "bm25_search",
    "containment_pairs",
    "copurchase_pagerank",
    "corpus_diff",
    "corpus_drift",
    "corpus_shuffle",
    "data_card",
    "decontaminate_fixed_bench",
    "dup_cluster_sizes",
    "dup_ngram_fraction",
    "embedding_neardup_lsh",
    "entity_resolution",
    "fuzzy_name_match",
    "hard_negatives",
    "incremental_curation",
    "kmeans_assign",
    "kmeans_assign_hier",
    "minhash_topk_similar",
    "pretrain_pipeline",
    "priority_sample",
    "quality_classifier",
    "quantile_sketch",
    "related_parts_ppr",
    "semantic_dedup",
    "temperature_sample",
    "vocab_growth",
    "zipf_slope",
    # --- changed in round 4 after their last green sample (3) ---------
    "simhash_neardup",
    "cosine_topk",
    "boilerplate_flag",
    # --- new in round 5: no external evidence yet ----------------------
    "running_distinct_users",
    "daily_anomaly_zscore",
    "gap_fill_interpolate",
    "session_transition_matrix",
    "window_ntile_cume",
    "bpe_merge_candidates",
    "readability_score",
    "char_entropy",
    "copurchase_triangles",
    "graph_degree_stats",
    "similar_parts_jaccard",
    "embedding_top_pc",
    "embedding_pc_projection",
    "word_pmi",
    "embedding_abtt",
    "numeric_corr",
    "ab_test_summary",
    "scd2_order_priority",
    "copurchase_communities",
    "ols_price_by_qty",
    "discount_revenue",
    "significant_parts",
    "priority_by_linestatus",
    "part_supplier_variety",
    "bulk_part_suppliers",
    "sole_returned_supplier",
    "dq_constraints",
    "chi2_terms",
    "naive_bayes_confusion",
    "pq_codes",
    "pq_topk",
    "window_time_range_avg",
    "grouping_sets_revenue",
    "mode_median_stats",
    "session_overlap_join",
    "approx_percentile_tdigest",
    "ivfpq_topk",
    "scd2_asof_lookup",
    "pq_recall",
    "vocab_coverage",
    "skyline_parts",
    "copurchase_bfs_hops",
    "repeated_spans",
    "copurchase_kcore",
    "mixture_allocation",
    "association_rules",
    "source_overlap",
    "seasonal_decompose_dow",
    "rfm_segmentation",
    "top_conversion_paths",
    "sql_interface_revenue",
    "nested_subsets",
    "embedding_skyline",
    "time_weighted_avg",
    "activity_streaks",
    "revenue_gini",
    "cusum_changepoint",
    "prefix_filter_jaccard",
    "clustering_coefficient",
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
