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
# registry must never again outgrow the evidence window.
#
# AGE-ROTATION RULE (round-8, per the round-7 verdict): with the
# never-sampled backlog at zero, the window rotates by verification AGE —
# (1) queries whose plans/code paths were EDITED since their last green
# row lead (their old evidence is stale), then (2) all other queries
# ordered by last-driver-verified round ASCENDING, ties alphabetical,
# truncated to the 50-slot window. `tools/evidence_gap.py --rotation`
# computes the ordering mechanically from CORRECTNESS_r*.json; regenerate
# the list below each round. Round-9 window: 3 edited + 8 new + ALL 39
# remaining r3 rows (the list runs six past the
# 50-slot window; the driver truncates, so the trailing r4 entries rotate
# into r10). After this round no green row predates r4, and the remaining
# 47 r4 rows fill most of the r10 window.
_EVIDENCE_PRIORITY: tuple[str, ...] = (
    # --- plans/code paths edited in round 9 -> re-sample first (3):
    # edit_neardup_pairs gained the short-title symmetric-deletion tier
    # (title_edit_neardup); edge_append_tables gained crashed-compaction
    # recovery (pagerank_from_merged_edges / edge_table_build) ---
    "title_edit_neardup",
    "pagerank_from_merged_edges",
    "edge_table_build",
    # --- new in round 9: no external evidence yet (8; budget:
    # 50 - 0 backlog - 3 edited = 47 allowed, 8 used) ---
    "incremental_edit_neardup",
    "incremental_semantic_neardup",
    "incremental_neardup_clusters",
    "cluster_retract",
    "ann_index_delete",
    "edge_table_retract",
    "neardup_clusters_from_state",
    "corpus_dedup_keep_from_state",
    # --- last driver-verified in r3 (oldest first, 39) ---
    "cosine_topk_bucketed",
    "curation_pipeline",
    "decontaminate",
    "doc_fingerprint",
    "doc_term_matrix",
    "embedding_neardup",
    "exact_dedup",
    "group_sample_topn",
    "hash_split",
    "incremental_neardup",
    "ivf_topk",
    "knn_classify",
    "label_centroids",
    "lang_id",
    "line_dedup",
    "minhash_neardup",
    "mixture_sample",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_resize",
    "neardup_by_source",
    "neardup_clusters",
    "ngram_jaccard",
    "pack_sequences",
    "pii_scrub",
    "quantize_embeddings",
    "repetition_stats",
    "scan_jsonl",
    "simhash_fingerprint",
    "stratified_sample",
    "text_quality",
    "text_stats",
    "tfidf_top_terms",
    "time_rollup",
    "token_budget_sample",
    "token_count_regex",
    "token_runs",
    "unigram_perplexity",
    "vocab_build",
    # --- last driver-verified in r4 (oldest first, head of the tail;
    # the remaining r4 rows rotate into r10) ---
    "agg_cube",
    "agg_percentiles",
    "approx_distinct",
    "cheapest_part_per_type",
    "click_purchase_attribution",
    "cms_heavy_hitters",
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
