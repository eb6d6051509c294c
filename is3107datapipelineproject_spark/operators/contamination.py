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
        freqs.crossJoin(F.broadcast(total))
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


def dup_ngram_fraction(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document duplicated-n-gram fraction (the RefinedWeb /
    MassiveText quality rule: docs whose k-grams mostly appear elsewhere
    are templated or scraped copies and get filtered): for each doc, the
    share of its DISTINCT k-gram hashes whose corpus document-frequency
    is ≥ 2. Returns ``(doc_id, n_grams, n_dup, dup_frac)`` with the
    fraction rounded to 4 decimals (one exact division — deterministic).

    Plan: one hash-aggregate for per-gram document frequency (distinct
    per doc already, so count == doc freq), one join back keyed on the
    gram hash, one per-doc re-aggregate. The join's build side has
    exactly ONE row per gram; the probe side's hottest key carries at
    most #docs rows — a boilerplate gram skews a probe partition, which
    AQE's skew-join split re-balances at runtime (asserted for the
    salted-join family in tests/test_salted_join.py). Unlike
    boilerplate_docs there is no df-share floor bounding the build side,
    so it does NOT broadcast — it shuffles once, same key both sides.
    """
    per_doc = _doc_ngram_hashes(docs, text_col, id_col, k)
    freqs = per_doc.groupBy("ngram_hash").agg(F.count(F.lit(1)).alias("__df"))
    dup = F.sum((F.col("__df") >= 2).cast("long")).cast("long")
    return (
        per_doc.join(freqs, "ngram_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            dup.alias("n_dup"),
            F.round(dup / F.count(F.lit(1)), 4).alias("dup_frac"),
        )
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "page_id",
    sep: str = "\n",
) -> DataFrame:
    """Exact line-level dedup (the RefinedWeb / CCNet boilerplate-line
    rule): across the whole corpus each distinct line survives only at
    its FIRST occurrence — smallest ``(id, position)`` — and documents
    are rebuilt without the dropped copies.

    Output: ``(id_col, n_lines, n_kept, text_clean)``.

    Scale design: the keep-first decision is a
    ``groupBy(line).agg(min(struct(id, pos)))`` — min is a combinable
    aggregate, so a boilerplate line repeated across millions of pages
    collapses map-side before the shuffle. The obvious alternative
    (``row_number() over (partition by line)``) funnels every copy of a
    hot line through one reducer — exactly the skew this operator
    exists to clean up. The keeper set then joins back on the FULL
    ``(line, id, pos)`` triple: keys are distinct per row, so the
    probe-side shuffle stays uniform no matter how hot a line is.
    Rebuild is one ``groupBy(id)`` whose collect is bounded by page
    size, never corpus size.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    first = (
        lines.groupBy("line")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("f"))
        .select(
            "line",
            F.col(f"f.{id_col}").alias(id_col),
            F.col("f.pos").alias("pos"),
            F.lit(True).alias("__keep"),
        )
    )
    marked = lines.join(first, ["line", id_col, "pos"], "left")
    kept_line = F.when(F.col("__keep"), F.col("line"))
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.coalesce(F.sum(F.col("__keep").cast("long")), F.lit(0)).cast("long").alias("n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), kept_line.alias("line")))),
                lambda x: x["line"],
            ),
        ).alias("text_clean"),
    )
