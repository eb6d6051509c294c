"""Physical-plan lint over the ENTIRE query registry.

Four invariants every registered query's plan must satisfy — the
failure modes that silently kill a plan at 100 TB:

- no ``CartesianProduct``: an un-broadcast cross join is O(n·m) shuffle
  work. Deliberate tiny-side cross joins (queries × corpus, 1-row
  aggregates) plan as ``BroadcastNestedLoopJoin``, which is allowed.
- no row-at-a-time Python UDF (``BatchEvalPython`` node): Python in a
  plan is only acceptable Arrow-batched (``ArrowEvalPython``,
  ``MapInPandas``, ``FlatMapGroupsInPandas``) or as the deliberate UDTF
  surface (``BatchEvalPythonUDTF`` — token_runs' lateral join demo).
- no UNPARTITIONED ``Window`` unless the query is allowlisted with a
  stated reason why the frame it sorts is BOUNDED (does not grow with
  the corpus/fact tables). An empty-partition window plans as
  ``Exchange SinglePartition → Sort → Window`` — one task sorts the
  whole frame, the class of defect behind the round-5 ``revenue_gini``
  / ``rfm_segmentation`` verdicts (both now ride
  operators.ranking.distributed_rank instead). Every new entry here
  must argue boundedness, or switch to the distributed rank.
- no EXPLODE-SIBLING re-evaluation: an expensive array expression in a
  Project directly above a Generate, referencing only pre-Generate
  columns, re-runs once per exploded row (the round-10
  ``repetition_stats`` 240× pathology) — see the rule block below.

Planning at sf0.001 exercises exactly what the driver/bench will run;
iterative operators execute their (tiny) fixpoint loops during plan
construction, which is part of the point — the lint sees the real plan.
"""

from __future__ import annotations

import json
import re

import pytest

from is3107datapipelineproject_spark.workload import registry

SF_SMOKE = "/root/testdata/sf0.001"

# BatchEvalPython <- row UDF (forbidden); BatchEvalPythonUDTF <- allowed.
ROW_UDF = re.compile(r"BatchEvalPython(?!UDTF)")

# query -> why its unpartitioned Window frames are bounded. The lint
# fails any query with an empty-partition Window that is not listed —
# "documented swap" is not enough; boundedness must be argued here.
UNPARTITIONED_WINDOW_ALLOWLIST: dict[str, str] = {
    # two-level distributed rank (operators/ranking.py): the prefix /
    # group-total windows run over the ≤ n_buckets(=64)-row bucket-count
    # aggregate, never the ranked frame itself.
    "revenue_gini": "distributed_rank bucket-offset prefix: ≤64 rows",
    "rfm_segmentation": "3× distributed_rank bucket-offset prefix: ≤64 rows each",
    # same machinery, hash-aligned buckets (sampling.deterministic_shuffle
    # / packing.pack_sequences): ≤1024-row bucket totals.
    "corpus_shuffle": "two-level shuffle rank bucket-offset prefix: ≤1024 rows",
    "pack_sequences": "distributed prefix-sum bucket offsets: ≤n_buckets rows",
    # calendar spines: one row per day (or day-of-week) — 36.5k rows per
    # century no matter the corpus size.
    "cusum_changepoint": "daily event spine: #days rows",
    "running_distinct_users": "daily event spine: #days rows",
    "robust_zscore_days": "median/MAD ranks over the #days calendar spine",
    "seasonal_decompose_dow": "daily spine + 7-row day-of-week frame",
    # histogram / sketch compactions: frame = distinct buckets/bins.
    "perplexity_buckets": "cumulative histogram over 4-dp surprisal bins",
    "quantile_sketch": "KLL-style compaction over sketch bins, not rows",
    "vocab_growth": "cumulative over fixed ingest buckets",
    # vocabulary-dimension frames (explicitly documented in
    # operators/text.py::build_vocab: Heaps' law keeps the DISTINCT
    # vocabulary in the millions — MBs — at 100 TB corpus scale).
    "vocab_build": "distinct-vocabulary rank (Heaps-law bounded, text.py:214)",
    "doc_term_matrix": "vocabulary rank inside build_vocab (same bound)",
    "zipf_slope": "rank over the top_k=500-row frequency head",
    # small dimension / frontier frames.
    "mixture_allocation": "per-source frame: #sources rows",
    "skyline_parts": "sweep over the local-pruned skyline frontier ≪ corpus",
    # distributed_cumsum (operators/ranking.py): same bucket-offset
    # machinery as distributed_rank — the unpartitioned prefix window
    # runs over the ≤64-row bucket-totals aggregate only.
    "ks_test_priority_revenue": "distributed_cumsum bucket-offset prefix: ≤64 rows",
    "time_to_convert_quantiles": "distributed_rank bucket-offset prefix: ≤64 rows",
    "winsorized_revenue_stats": "distributed_rank bucket-offset prefix: ≤64 rows",
    "quality_auc": "distributed_cumsum bucket-offset prefix: ≤64 rows",
    # decile key is least(p4 // 1000, 9): the windowed frame is the
    # 10-row decile aggregate at any corpus size.
    "precision_recall_curve": "decile aggregate: ≤10 rows by construction",
    # replicate-mean frame is exactly _BOOT_B = 32 rows at any corpus size
    "multiplier_bootstrap_ci": "bootstrap replicate frame: exactly _BOOT_B=32 rows",
    "trend_robust_stats": "distributed_rank bucket-offset prefix: ≤64 rows",
    # the BM25 arm is already LIMIT top_n=20 before this rank window
    "rrf_fusion": "lexical-arm rank over the BM25 top-20 frame: ≤20 rows",
    "conformal_price_interval": "distributed_rank bucket-offset prefix: ≤64 rows",
}

_UNPART_WINDOW_RE = re.compile(r"\.Window$")


def _unpartitioned_windows(df) -> int:
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    return sum(
        1
        for n in nodes
        if _UNPART_WINDOW_RE.search(n.get("class", "")) and not n.get("partitionSpec")
    )


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_plan_has_no_cartesian_or_row_python(spark, name):
    fn = registry.queries()[name]
    df = fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert not ROW_UDF.search(plan), f"{name}: row-at-a-time Python UDF in plan"
    n_unpart = _unpartitioned_windows(df)
    if n_unpart and name not in UNPARTITIONED_WINDOW_ALLOWLIST:
        pytest.fail(
            f"{name}: {n_unpart} unpartitioned Window node(s) — a single-task "
            "sort at scale. Use operators.ranking.distributed_rank, or argue "
            "boundedness in UNPARTITIONED_WINDOW_ALLOWLIST."
        )
    # explode-sibling rule (round 11; one plan build serves all lints —
    # a separate parametrized test would double the suite's compile time)
    off = explode_sibling_offenses(df)
    if off and name not in EXPLODE_SIBLING_ALLOWLIST:
        pytest.fail(
            f"{name}: expensive array expression(s) {off} in a Project "
            "directly above a Generate, referencing only pre-Generate "
            "columns — re-evaluated once per exploded row. Compute it in "
            "the Generate's child (separate select before the explode), "
            "or argue per-row necessity in EXPLODE_SIBLING_ALLOWLIST."
        )


def test_window_allowlist_entries_are_live():
    """Every allowlist entry must name a registered query — stale
    entries hide new regressions behind old reasons."""
    qs = registry.queries()
    stale = [n for n in UNPARTITIONED_WINDOW_ALLOWLIST if n not in qs]
    assert not stale, f"stale allowlist entries: {stale}"


# ---------------------------------------------------------------------------
# Explode-sibling rule (round-11, mechanizing the round-10 repetition_stats
# lesson): an expensive array expression written as a SIBLING of an explode
# lands in the Project ABOVE the Generate and re-evaluates once per exploded
# row (~fan-out× per document) — the oracle stays green while the plan is
# 240× off. Flag every Project directly above a Generate (through Filters)
# whose projectList evaluates an expensive array function over columns
# computed BELOW the Generate and NOT over the generator's own output —
# i.e. work that could (and should) be computed once per input row in the
# Generate's child. Expressions that reference the generator output are
# inherent per-row work (e.g. chunk_documents slicing a different token
# window per chunk index) and are not flagged.

EXPENSIVE_ARRAY_EXPRS = {
    "ArrayDistinct", "ArraySort", "SortArray", "ArrayAggregate",
    "ArrayFilter", "ArrayTransform", "ZipWith", "ArrayIntersect",
    "ArrayExcept", "ArrayUnion", "ArraysOverlap", "ArrayRepeat",
    "Slice", "Flatten", "ArrayJoin",
}

# query -> why its flagged Project-above-Generate expression is fine.
# (Empty as of round 11: the one candidate, chunk_documents, references
# the generator output and is therefore excluded by construction.)
EXPLODE_SIBLING_ALLOWLIST: dict[str, str] = {}


def _node_cls(n) -> str:
    return n.get("class", "").split(".")[-1]


def _expr_tree(flat, i=0):
    """Rebuild one pre-order-flattened Catalyst expression tree."""
    n = dict(flat[i])
    n["_children"] = []
    j = i + 1
    for _ in range(n.get("num-children", 0)):
        c, j = _expr_tree(flat, j)
        n["_children"].append(c)
    return n, j


def _subtree_attr_ids(n, out):
    if _node_cls(n) == "AttributeReference":
        out.add(n["exprId"]["id"])
    for c in n["_children"]:
        _subtree_attr_ids(c, out)


def _raw_attr_ids(obj, out):
    """exprIds of every AttributeReference in raw (un-treeified) JSON."""
    if isinstance(obj, dict):
        if _node_cls(obj) == "AttributeReference":
            out.add(obj["exprId"]["id"])
        for v in obj.values():
            _raw_attr_ids(v, out)
    elif isinstance(obj, list):
        for v in obj:
            _raw_attr_ids(v, out)


def explode_sibling_offenses(df) -> list[tuple[str, tuple[str, ...]]]:
    """(expensive_expr_class, referenced_column_names) for every
    hoistable expensive expression sitting in a Project directly above
    a Generate in the optimized plan."""
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    root, _ = _expr_tree(nodes, 0)  # plan nodes flatten the same way
    offenses: list[tuple[str, tuple[str, ...]]] = []

    def scan_expr(n, gen_out):
        if _node_cls(n) in EXPENSIVE_ARRAY_EXPRS:
            attrs: set[int] = set()
            _subtree_attr_ids(n, attrs)
            if attrs and not (attrs & gen_out):
                names = []

                def nm(x):
                    if _node_cls(x) == "AttributeReference":
                        names.append(x["name"])
                    for c in x["_children"]:
                        nm(c)

                nm(n)
                offenses.append((_node_cls(n), tuple(sorted(set(names)))))
                return  # don't double-report nested expensive children
        for c in n["_children"]:
            scan_expr(c, gen_out)

    def walk(n):
        if _node_cls(n) == "Project" and n["_children"]:
            c = n["_children"][0]
            while _node_cls(c) == "Filter" and c["_children"]:
                c = c["_children"][0]
            if _node_cls(c) == "Generate":
                gen_out: set[int] = set()
                _raw_attr_ids(c.get("generatorOutput"), gen_out)
                for proj in n.get("projectList", []):
                    flat = proj if isinstance(proj, list) else [proj]
                    tree, _ = _expr_tree(flat, 0)
                    scan_expr(tree, gen_out)
        for c in n["_children"]:
            walk(c)

    walk(root)
    return offenses


def test_explode_sibling_rule_catches_the_prefix_repetition_stats(spark):
    """The rule must be RED on the reverted pre-fix repetition_stats
    shape (the O(len²) bigram expression as an explode sibling) and
    GREEN on HEAD's narrow-scan rewrite — the round-10 verdict's
    acceptance criterion for mechanizing the manual 73-site sweep."""
    from pyspark.sql import functions as F

    from is3107datapipelineproject_spark.operators.dedup import word_shingles
    from is3107datapipelineproject_spark.operators.text import repetition_stats, ws_tokens

    df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bigrams = word_shingles("text", k=2)
    dup = F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams).cast("double"),
        4,
    )
    prefix_shape = (
        df.select(
            F.col("doc_id"), dup.alias("dup_2gram_frac"), F.explode(ws_tokens("text")).alias("token")
        )
        .groupBy("doc_id", "dup_2gram_frac", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("doc_id", "dup_2gram_frac")
        .agg(F.round(F.max("tf").cast("double") / F.sum("tf").cast("double"), 4).alias("top_token_frac"))
        .select("doc_id", "top_token_frac", "dup_2gram_frac")
    )
    assert explode_sibling_offenses(prefix_shape), "rule missed the pre-fix pathology"
    assert explode_sibling_offenses(repetition_stats(df, "text", "doc_id")) == []

    # inherent per-row work over the generator output must NOT flag
    chunky = df.select(F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"), "text").select(
        F.slice(F.split("text", " "), F.col("i") * 2 + 1, 2).alias("w")
    )
    assert explode_sibling_offenses(chunky) == []


def test_explode_allowlist_entries_are_live():
    qs = registry.queries()
    stale = [n for n in EXPLODE_SIBLING_ALLOWLIST if n not in qs]
    assert not stale, f"stale allowlist entries: {stale}"
