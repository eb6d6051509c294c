"""Non-triviality probes for every split/holdout/incremental/sampling
registration (round 12, verdict item 1).

Each probe re-states its query's split and returns named STRUCTURAL
counts: the size of each side plus at least one crossing witness —
shared blocks, new×old candidate pairs, held-out hits, rejected
arrivals, dropped sample rows. tests/test_registry_docs.py asserts
every count ≥ 1 at sf0.01, so a registration whose split is
degenerate (a side empty, or two non-empty sides that never interact —
the ``doc_id % 5`` × ``source = src(doc_id % 20)`` incident) fails
loudly instead of riding a green-but-vacuous oracle row forever.

The probes deliberately restate the split literals instead of
importing them from the query bodies: a drift between the two is
itself a failure the reviewer should see (the probe's counts stop
matching the query's behavior), and several queries inline their
splits into SQL oracles where no shared constant exists. Crossing
witnesses that are exactly the query's output reuse the registered
callable (``REGISTRY[name].fn``), so they can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.sources.tables import load_table
from is3107datapipelineproject_spark.workload.registry import REGISTRY, split_probe


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _out(name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    return REGISTRY[name].fn(spark, sf_dir)


def zero_counts(probe_result: dict) -> list[str]:
    """The names of the structural counts a probe found EMPTY — the
    check the registry test applies to every probe. Pure function so
    the degenerate-split demonstrations (reverted % 5 split, synthetic
    no-shared-block split) can assert detection without a driver run."""
    return sorted(k for k, v in probe_result.items() if not v)


def blocked_split_structure(spark: SparkSession, sf_dir: str, mod: int = 7) -> dict:
    """Side sizes + shared-block count of the blocked incremental
    split, parametrized by the modulus so the registry test can
    demonstrate that the REVERTED ``% 5`` split (every source on one
    side: 20 | 5·k) comes back with ``shared_blocks == 0`` and would
    fail the guard."""
    d = _docs(spark, sf_dir)
    new = d.filter(F.col("doc_id") % mod == 0)
    old = d.filter(F.col("doc_id") % mod != 0)
    shared = (
        new.select("source")
        .distinct()
        .join(old.select("source").distinct(), "source")
        .count()
    )
    return {"batch": new.count(), "corpus": old.count(), "shared_blocks": shared}


# --- incremental dedup family ------------------------------------------


def _mod5_docs_sides(spark: SparkSession, sf_dir: str) -> dict:
    d = _docs(spark, sf_dir)
    return {
        "batch": d.filter(F.col("doc_id") % 5 == 0).count(),
        "corpus": d.filter(F.col("doc_id") % 5 != 0).count(),
    }


@split_probe("incremental_neardup")
def p_incremental_neardup(spark: SparkSession, sf_dir: str) -> dict:
    s = _mod5_docs_sides(spark, sf_dir)
    s["cross_pairs"] = _out("incremental_neardup", spark, sf_dir).count()
    return s


@split_probe("incremental_prefix_jaccard")
def p_incremental_prefix_jaccard(spark: SparkSession, sf_dir: str) -> dict:
    s = _mod5_docs_sides(spark, sf_dir)
    s["cross_pairs"] = _out("incremental_prefix_jaccard", spark, sf_dir).count()
    return s


@split_probe("incremental_blocked_jaccard")
def p_incremental_blocked_jaccard(spark: SparkSession, sf_dir: str) -> dict:
    s = blocked_split_structure(spark, sf_dir, mod=7)
    s["cross_pairs"] = _out("incremental_blocked_jaccard", spark, sf_dir).count()
    return s


@split_probe("incremental_semantic_neardup")
def p_incremental_semantic_neardup(spark: SparkSession, sf_dir: str) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    return {
        "batch": emb.filter(F.col("vec_id") % 5 == 0).count(),
        "corpus": emb.filter(F.col("vec_id") % 5 != 0).count(),
        "cross_pairs": _out("incremental_semantic_neardup", spark, sf_dir).count(),
    }


@split_probe("incremental_edit_neardup")
def p_incremental_edit_neardup(spark: SparkSession, sf_dir: str) -> dict:
    base = _docs(spark, sf_dir).filter(F.col("n_chars") >= 40)
    return {
        "batch_base": base.filter(F.col("doc_id") % 7 == 2).count(),
        "corpus_base": base.filter(F.col("doc_id") % 7 != 2).count(),
        "cross_pairs": _out("incremental_edit_neardup", spark, sf_dir).count(),
    }


@split_probe("incremental_neardup_clusters")
def p_incremental_neardup_clusters(spark: SparkSession, sf_dir: str) -> dict:
    s = _mod5_docs_sides(spark, sf_dir)
    out = _out("incremental_neardup_clusters", spark, sf_dir)
    # crossing witness: >=1 maintained cluster holds BOTH a batch and a
    # corpus member — the merge the incremental update exists to do
    s["clusters_spanning_sides"] = (
        out.withColumn("side", (F.col("doc_id") % 5 == 0).cast("int"))
        .groupBy("cluster_id")
        .agg(F.countDistinct("side").alias("ns"))
        .filter(F.col("ns") == 2)
        .count()
    )
    return s


@split_probe("incremental_curation")
def p_incremental_curation(spark: SparkSession, sf_dir: str) -> dict:
    from is3107datapipelineproject_spark.operators.text import quality_score

    s = _mod5_docs_sides(spark, sf_dir)
    arrivals = _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    clean = (
        arrivals.select(F.round(quality_score("text"), 4).alias("q"))
        .filter(F.col("q") >= 0.4)
        .count()
    )
    admitted = _out("incremental_curation", spark, sf_dir).count()
    s["clean_arrivals"] = clean
    # crossing witness: >=1 clean arrival rejected by a CORPUS near-dup
    s["rejected_by_corpus_dup"] = clean - admitted
    return s


@split_probe("incremental_merge")
def p_incremental_merge(spark: SparkSession, sf_dir: str) -> dict:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    known = o.filter(F.col("o_orderkey") % 3 != 0)
    parsed = o.filter(F.col("o_orderkey") % 2 == 0)
    overlap = known.join(parsed, "o_orderkey").count()
    return {
        "known": known.count(),
        "parsed": parsed.count(),
        "overlap": overlap,  # keys the merge must reconcile
        "known_only": known.count() - overlap,  # deletions to detect
        "parsed_only": parsed.count() - overlap,  # insertions to detect
    }


# --- retraction / right-to-be-forgotten family --------------------------


def _retract_structure(spark: SparkSession, sf_dir: str) -> dict:
    from is3107datapipelineproject_spark.operators import dedup as D

    d = _docs(spark, sf_dir)
    pairs = D.minhash_neardup_pairs(d, "text", "doc_id", threshold=0.8)
    return {
        "deleted": d.filter(F.col("doc_id") % 17 == 3).count(),
        "survivors": d.filter(F.col("doc_id") % 17 != 3).count(),
        # crossing witness: the deleted set actually touches >=1 cluster
        # pair — otherwise the retraction is a no-op and the oracle's
        # filtered-closure identity holds vacuously
        "pairs_touching_deleted": pairs.filter(
            (F.col("doc1") % 17 == 3) | (F.col("doc2") % 17 == 3)
        ).count(),
    }


@split_probe("cluster_retract")
def p_cluster_retract(spark: SparkSession, sf_dir: str) -> dict:
    return _retract_structure(spark, sf_dir)


@split_probe("cluster_retract_from_state")
def p_cluster_retract_from_state(spark: SparkSession, sf_dir: str) -> dict:
    return _retract_structure(spark, sf_dir)


@split_probe("edge_table_retract")
def p_edge_table_retract(spark: SparkSession, sf_dir: str) -> dict:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ret = li.filter(F.col("l_orderkey") % 13 == 2)
    arcs = (
        ret.alias("a")
        .join(ret.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .count()
    )
    return {
        "retracted_orders": ret.select("l_orderkey").distinct().count(),
        "surviving_orders": li.filter(F.col("l_orderkey") % 13 != 2)
        .select("l_orderkey")
        .distinct()
        .count(),
        "retracted_arcs": arcs,  # the weight the retraction must remove
    }


# --- contamination / leakage family -------------------------------------


def _mod50_sides(spark: SparkSession, sf_dir: str) -> dict:
    d = _docs(spark, sf_dir)
    return {
        "eval": d.filter(F.col("doc_id") % 50 == 0).count(),
        "train": d.filter(F.col("doc_id") % 50 != 0).count(),
    }


@split_probe("decontaminate")
def p_decontaminate(spark: SparkSession, sf_dir: str) -> dict:
    s = _mod50_sides(spark, sf_dir)
    s["held_out_hits"] = _out("decontaminate", spark, sf_dir).count()
    return s


@split_probe("bloom_contamination")
def p_bloom_contamination(spark: SparkSession, sf_dir: str) -> dict:
    s = _mod50_sides(spark, sf_dir)
    s["bloom_hits"] = _out("bloom_contamination", spark, sf_dir).count()
    return s


@split_probe("contamination_report")
def p_contamination_report(spark: SparkSession, sf_dir: str) -> dict:
    s = _mod50_sides(spark, sf_dir)
    s["contaminated_docs"] = int(
        _out("contamination_report", spark, sf_dir)
        .agg(F.sum("n_contaminated"))
        .first()[0]
        or 0
    )
    return s


@split_probe("decontaminate_fixed_bench")
def p_decontaminate_fixed_bench(spark: SparkSession, sf_dir: str) -> dict:
    d = _docs(spark, sf_dir)
    return {
        "frozen_bench": d.filter(F.col("doc_id") < 100).count(),
        "train": d.filter(F.col("doc_id") >= 100).count(),
        "held_out_hits": _out("decontaminate_fixed_bench", spark, sf_dir).count(),
    }


@split_probe("split_leakage")
def p_split_leakage(spark: SparkSession, sf_dir: str) -> dict:
    hs = _out("hash_split", spark, sf_dir)
    return {
        "test": hs.filter(F.col("split") == "test").count(),
        "non_test": hs.filter(F.col("split") != "test").count(),
        "leaked_docs": _out("split_leakage", spark, sf_dir).count(),
    }


# --- corpus release diff/drift family ------------------------------------


def _release_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    d = _docs(spark, sf_dir)
    return (
        d.filter(F.col("doc_id") % 7 != 0),
        d.filter(F.col("doc_id") % 11 != 0),
    )


@split_probe("corpus_diff")
def p_corpus_diff(spark: SparkSession, sf_dir: str) -> dict:
    v1, v2 = _release_sides(spark, sf_dir)
    both = v1.select("doc_id").join(v2.select("doc_id"), "doc_id")
    return {
        "v1": v1.count(),
        "v2": v2.count(),
        "in_both": both.count(),
        "changed_in_both": both.filter(F.col("doc_id") % 5 == 0).count(),
        "v1_only": v1.join(v2.select("doc_id"), "doc_id", "left_anti").count(),
        "v2_only": v2.join(v1.select("doc_id"), "doc_id", "left_anti").count(),
    }


@split_probe("corpus_drift")
def p_corpus_drift(spark: SparkSession, sf_dir: str) -> dict:
    v1, v2 = _release_sides(spark, sf_dir)
    shared = (
        v1.select("source")
        .distinct()
        .join(v2.select("source").distinct(), "source")
        .count()
    )
    return {"v1": v1.count(), "v2": v2.count(), "shared_dim_values": shared}


@split_probe("embedding_release_drift")
def p_embedding_release_drift(spark: SparkSession, sf_dir: str) -> dict:
    # the query's single output row CARRIES its side sizes — read them
    r = _out("embedding_release_drift", spark, sf_dir).first()
    return {"release_a": int(r["n_a"]), "release_b": int(r["n_b"])}


# --- sampling family (sides = kept vs dropped) ---------------------------


def _kept_dropped(name: str, spark: SparkSession, sf_dir: str) -> dict:
    pool = _docs(spark, sf_dir).count()
    kept = _out(name, spark, sf_dir).count()
    return {"kept": kept, "dropped": pool - kept}


@split_probe("priority_sample")
def p_priority_sample(spark: SparkSession, sf_dir: str) -> dict:
    return _kept_dropped("priority_sample", spark, sf_dir)


@split_probe("stratified_sample")
def p_stratified_sample(spark: SparkSession, sf_dir: str) -> dict:
    return _kept_dropped("stratified_sample", spark, sf_dir)


@split_probe("temperature_sample")
def p_temperature_sample(spark: SparkSession, sf_dir: str) -> dict:
    return _kept_dropped("temperature_sample", spark, sf_dir)


@split_probe("mixture_sample")
def p_mixture_sample(spark: SparkSession, sf_dir: str) -> dict:
    return _kept_dropped("mixture_sample", spark, sf_dir)


@split_probe("importance_resample")
def p_importance_resample(spark: SparkSession, sf_dir: str) -> dict:
    return _kept_dropped("importance_resample", spark, sf_dir)


@split_probe("token_budget_sample")
def p_token_budget_sample(spark: SparkSession, sf_dir: str) -> dict:
    return _kept_dropped("token_budget_sample", spark, sf_dir)


@split_probe("group_sample_topn")
def p_group_sample_topn(spark: SparkSession, sf_dir: str) -> dict:
    return _kept_dropped("group_sample_topn", spark, sf_dir)


@split_probe("hash_split")
def p_hash_split(spark: SparkSession, sf_dir: str) -> dict:
    hs = _out("hash_split", spark, sf_dir)
    counts = {r["split"]: r["n"] for r in hs.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    return {
        "train": counts.get("train", 0),
        "val": counts.get("val", 0),
        "test": counts.get("test", 0),
    }


@split_probe("multimodal_frame_sample")
def p_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> dict:
    out = _out("multimodal_frame_sample", spark, sf_dir)
    return {
        "docs": out.count(),
        # a sampler that keeps EVERY frame tests nothing: >=1 doc must
        # actually have frames dropped by the every-nth rule
        "docs_with_dropped_frames": out.filter(
            F.col("n_kept") < F.col("n_frames")
        ).count(),
    }
