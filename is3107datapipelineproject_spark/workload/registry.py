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
# the list below each round. Round-8 window: 4 edited (mmr_rerank
# checkpoint fix; ann_index_append/edge_table_append self-compaction
# wiring) + 5 new (title_edit_neardup, rolling_active_users,
# robust_zscore_days, relational_division, user_active_time — budget:
# 50 − 0 backlog − 4 edited = 46 allowed, 5 used) + the 41 oldest rows (all of r1, all of r2, and the r3 head) —
# the remaining r3/r4 tail rotates into r9/r10.
_EVIDENCE_PRIORITY: tuple[str, ...] = (
    # --- plans/code paths edited in round 8 -> re-sample first (4) ---
    "mmr_rerank",
    "ann_index_append",
    "pagerank_from_merged_edges",
    "edge_table_build",
    # --- new in round 8: no external evidence yet (5) ---
    "title_edit_neardup",
    "rolling_active_users",
    "robust_zscore_days",
    "relational_division",
    "user_active_time",
    # --- last driver-verified in r1 (oldest first) ---
    "author_ordinal",
    "events_tumbling_window",
    "except_by_key",
    "f_category",
    "f_coalesce",
    "f_date_format",
    "f_from_json",
    "f_map_values",
    "f_struct",
    "f_to_date",
    "f_zip_authors",
    "incremental_merge",
    "limit_n",
    "q3_collab_totals",
    "q4_collab_year",
    "sort_by_key",
    "union_all",
    # --- last driver-verified in r2 (oldest first) ---
    "agg_count_by_year",
    "agg_count_distinct",
    "agg_rollup",
    "agg_sum_by_author",
    "antijoin_deleted",
    "antijoin_new",
    "distinct_pubs",
    "filter_eq",
    "filter_in",
    "filter_map_contains",
    "pair_counts",
    "q1_nth_author",
    "q2_nth_author",
    "q_point_lookup",
    "scan_csv",
    "scan_or_empty",
    "semijoin_members",
    "volume_metrics",
    # --- last driver-verified in r3 (oldest first) ---
    "ann_recall",
    "centroid_outliers",
    "chunk_documents",
    "corpus_dedup_keep",
    "corpus_dedup_keep_best",
    "corpus_shards",
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
