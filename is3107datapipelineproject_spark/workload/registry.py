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
_EVIDENCE_PRIORITY: tuple[str, ...] = (
    # never externally sampled: TPC-H-flavor join suite
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "promo_revenue_share",
    "order_priority_exists",
    "large_order_customers",
    "disjunctive_part_revenue",
    "dormant_rich_customers",
    "cheapest_part_per_type",
    "top_supplier_revenue",
    "volume_shipping",
    "market_share",
    "product_profit",
    "returned_items",
    "customer_order_distribution",
    "small_qty_revenue",
    # never externally sampled: window / shaping family
    "filter_bool",
    "agg_cube",
    "agg_percentiles",
    "window_lag_lead",
    "window_rank_dense",
    "window_moving_sum",
    "pivot_priority_by_year",
    "unpivot_lineitem_metrics",
    "salted_join_agg",
    "key_skew_stats",
    # never externally sampled: events family
    "events_funnel",
    "events_sliding_window",
    "events_session_window",
    "events_sessionize",
    "events_dedup_keys",
    "click_purchase_attribution",
    "cohort_retention",
    # never externally sampled: domain + scalar stragglers
    "xml_flatten",
    "dblp_contains_author",
    "dblp_nth_author_count",
    "dblp_collab_totals",
    "f_parse_int_map",
    "f_null_fill",
    "importance_resample",
    "length_quantiles",
    "source_quality_filter",
    "lang_mismatch",
    "perplexity_buckets",
    "document_features",
    # previously rows-only / err:no_oracle — now hash-checkable
    "hll_mergeable_sketch",
    "approx_distinct",
    # new this round, no external evidence yet (first two fit in the
    # 50-query sample window; the rest lead the next round's rotation)
    "cms_heavy_hitters",
    "split_leakage",
    "contamination_report",
    "dup_cluster_sizes",
    "corpus_shuffle",
    "bloom_contamination",
    "data_card",
    "corpus_diff",
    "incremental_curation",
    "embedding_neardup_lsh",
    "minhash_topk_similar",
    "decontaminate_fixed_bench",
    "kmeans_assign",
    "semantic_dedup",
    "dup_ngram_fraction",
    "hard_negatives",
    "temperature_sample",
    "quality_classifier",
    "kmeans_assign_hier",
    "containment_pairs",
    "pretrain_pipeline",
    "bigram_surprisal",
    "corpus_drift",
    "blocklist_filter",
    "vocab_growth",
    "zipf_slope",
    "copurchase_pagerank",
    "fuzzy_name_match",
    "priority_sample",
    "quantile_sketch",
    "bm25_search",
    "entity_resolution",
    "related_parts_ppr",
    # operators changed this round — worth an external re-check after
    # the zero-evidence queries above are covered
    "simhash_neardup",
    "cosine_topk",
    "boilerplate_flag",
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
        star_queries,
        tpch_queries,
        window_queries,
    )

    _LOADED = True
