"""Benchmark decontamination + corpus-level boilerplate detection.

Beyond-reference surface (driver mandate): two corpus-hygiene operators
every LLM training pipeline runs before the data ships.

- **Decontamination**: training documents sharing any word-k-gram with a
  held-out benchmark/eval set must be flagged (the GPT-3/PaLM n-gram
  overlap rule) — otherwise eval scores measure memorization. Shape:
  the eval set's distinct n-gram hashes are a SMALL relation (eval sets
  are thousands of docs; the corpus is billions), so the plan is an
  explode of the corpus's n-gram hashes semi-joined against the eval
  hashes and re-aggregated by doc — one shuffle keyed by n-gram hash,
  and AQE broadcasts the eval side when it fits. Never a cross join;
  never a Python UDF.

- **Boilerplate detection**: n-grams occurring in more than a share of
  all documents (navigation chrome, cookie banners, license headers)
  are corpus-level artifacts, not content. Two-pass plan: (1) document
  frequency per n-gram hash (explode + count-distinct-by-doc — one
  hash-aggregate), (2) flag documents containing any hot n-gram
  (semi-join docs' exploded hashes against the hot set). The hot set is
  tiny by construction (df-share threshold), so pass 2's join is
  broadcast-able at any corpus size.

Both reuse dedup.word_shingles / dedup.h28, so the DuckDB oracles derive
from the same constants (md5-based hashes, identical shingling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.dedup import h28, spread_small_input, word_shingles


def _doc_ngram_hashes(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(doc_id, ngram_hash) — distinct k-gram hashes per document,
    exploded. Narrow until the explode (plus the under-partitioned-input
    spread: the md5-per-shingle stage is CPU-bound and must not
    serialize on one task when the scan arrives as a single split)."""
    df = spread_small_input(df)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.transform(word_shingles(text_col, k), h28))).alias(
            "ngram_hash"
        ),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Flag training documents that share at least one word-k-gram with
    the eval set: returns ``(doc_id, n_hits)`` where n_hits counts the
    doc's DISTINCT contaminated k-grams (the triage signal: 1 hit is a
    common phrase, 50 hits is a leaked eval row). Only contaminated docs
    are returned — at corpus scale the clean majority never leaves the
    aggregate.

    eval_docs rows present in ``docs`` (same id) are not special-cased;
    callers exclude the eval ids from the training side first (the
    registered query does).
    """
    train = _doc_ngram_hashes(docs, text_col, id_col, k)
    dirty = _doc_ngram_hashes(eval_docs, text_col, id_col, k).select("ngram_hash").distinct()
    return (
        train.join(dirty, "ngram_hash", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def hot_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_doc_share: float = 0.05,
) -> DataFrame:
    """N-gram hashes whose document frequency is ≥ ``min_doc_share`` of
    the corpus: ``(ngram_hash, doc_freq)``. One count aggregate over the
    exploded distinct-per-doc hashes; the doc count is a scalar subplan
    (cross join of a 1-row aggregate — never a collect)."""
    per_doc = _doc_ngram_hashes(docs, text_col, id_col, k)
    freqs = per_doc.groupBy("ngram_hash").agg(F.count(F.lit(1)).alias("doc_freq"))
    total = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    return (
        freqs.crossJoin(total)
        .filter(F.col("doc_freq") >= F.col("__n_docs") * F.lit(min_doc_share))
        .select("ngram_hash", "doc_freq")
    )


def boilerplate_docs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_doc_share: float = 0.05,
) -> DataFrame:
    """Documents containing at least one corpus-hot k-gram:
    ``(doc_id, n_boiler)`` with the count of distinct hot k-grams in the
    doc. The hot set is bounded by 1/min_doc_share × avg-grams-per-doc,
    so the flagging join broadcasts at any corpus size."""
    hot = hot_ngrams(docs, text_col, id_col, k, min_doc_share).select("ngram_hash")
    per_doc = _doc_ngram_hashes(docs, text_col, id_col, k)
    return (
        per_doc.join(F.broadcast(hot), "ngram_hash", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
