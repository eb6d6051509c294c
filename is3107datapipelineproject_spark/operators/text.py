"""Text-analysis operators for large-scale training-data pipelines.

Everything here is pure JVM-side column expressions (no Python UDFs):
narrow, codegen-friendly, shuffle-free per-document computation — the
shape that survives a 100 TB corpus unchanged (each executor scans its
parquet split, computes, writes; zero exchanges).

Beyond-reference surface (driver mandate): the reference pipeline
(`/root/reference/main_dag.py`) has no text analytics; these operators
are what a training-data curation pipeline runs over a `documents`
corpus — token counting, quality scoring, language-ID, fingerprinting.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword lang-ID
# heuristic. Deliberately small and fixed: the operator contract is a
# deterministic, oracle-checkable scoring rule, not a trained model.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ein", "zu", "ist"),
    "fr": ("le", "la", "les", "et", "un", "une", "est"),
    "es": ("el", "la", "los", "y", "un", "una", "es"),
}


def normalize_text(col: Column | str) -> Column:
    """Whitespace-collapse + lowercase — the canonical form every text
    operator (dedup fingerprints, shingles, token stats) derives from."""
    return F.trim(F.regexp_replace(F.lower(F.col(col) if isinstance(col, str) else col), r"\s+", " "))


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization over the normalized form."""
    return F.split(normalize_text(col), " ")


def regex_token_count(col: Column | str, pattern: str = "[a-z0-9]+") -> Column:
    """BPE-ish token counting: count maximal matches of ``pattern`` in the
    normalized text (a cheap, deterministic proxy for subword tokenizer
    counts — the real tokenizer is a Pandas UDF behind the same column
    contract)."""
    c = normalize_text(col)
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def _isin_lambda(words: tuple[str, ...]):
    """One-arg lambda factory (pyspark inspects lambda arity: a defaulted
    second arg would be mistaken for the element-index parameter)."""
    return lambda t: t.isin(*words)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Fraction of whitespace tokens that are in ``stopwords`` (double)."""
    toks = ws_tokens(col)
    hits = F.size(F.filter(toks, _isin_lambda(stopwords)))
    return hits.cast("double") / F.size(toks).cast("double")


def type_token_ratio(col: Column | str) -> Column:
    """Lexical diversity: distinct tokens / total tokens (double)."""
    toks = ws_tokens(col)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars over the raw text (double)."""
    raw = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(raw, r"[.,;:!?'\"()\[\]{}-]", "")
    return (F.length(raw) - F.length(stripped)).cast("double") / F.length(raw).cast("double")


def quality_score(col: Column | str, target_tokens: int = 100) -> Column:
    """Composite document-quality heuristic in [0, 1]:

    0.5 * min(1, n_tokens/target)      -- enough content
    + 0.3 * type_token_ratio           -- lexical diversity
    + 0.2 * (1 - punct_ratio)          -- not punctuation soup

    Deterministic rational arithmetic; callers round for cross-engine
    comparison.
    """
    toks = ws_tokens(col)
    n = F.size(toks).cast("double")
    length_term = F.least(F.lit(1.0), n / F.lit(float(target_tokens)))
    return (
        F.lit(0.5) * length_term
        + F.lit(0.3) * type_token_ratio(col)
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio(col))
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-profile score (hit count, ties broken by the
    fixed language order in ``predict_lang``)."""
    toks = ws_tokens(col)
    return {
        lang: F.size(F.filter(toks, _isin_lambda(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }


def predict_lang(col: Column | str, min_hits: int = 1) -> Column:
    """Language-ID heuristic: argmax over ``LANG_STOPWORDS`` profiles,
    'und' (undetermined) when no profile reaches ``min_hits``. Tie-break:
    first language in LANG_STOPWORDS insertion order wins (deterministic)."""
    scores = lang_scores(col)
    best = reduce(F.greatest, scores.values())
    expr = F.lit("und")
    # Build the CASE from last to first so earlier langs win ties.
    for lang in reversed(list(scores)):
        expr = F.when((scores[lang] == best) & (best >= min_hits), F.lit(lang)).otherwise(expr)
    return expr


def token_frequencies(df, text_col: str, id_col: str):
    """Per-document token counts ``(id, token, tf)`` via explode +
    hash-aggregate. One shuffle on ``(id, token)`` with map-side partial
    aggregation — linear in corpus size, robust to arbitrarily long
    documents (unlike per-row quadratic higher-order-function counting)."""
    toks = ws_tokens(text_col)
    return (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def repetition_stats(df, text_col: str, id_col: str):
    """Gopher-style repetition signals per document:

    - ``top_token_frac``: frequency of the most common token / total
      tokens (catches "word word word ..." degenerate text),
    - ``dup_2gram_frac``: 1 − distinct-bigram / bigram count (catches
      looping phrase repetition).

    The bigram fraction is a narrow column expression carried through
    the token-frequency aggregation as a grouping constant, so the whole
    operator is one scan and one exchange chain on the doc id — no join
    back to the corpus.
    """
    from is3107datapipelineproject_spark.operators.dedup import word_shingles

    bigrams = word_shingles(text_col, k=2)
    dup = F.round(
        F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams).cast("double"),
        4,
    )
    exploded = df.select(
        F.col(id_col), dup.alias("dup_2gram_frac"), F.explode(ws_tokens(text_col)).alias("token")
    )
    tf = exploded.groupBy(id_col, "dup_2gram_frac", "token").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy(id_col, "dup_2gram_frac").agg(
        F.round(F.max("tf").cast("double") / F.sum("tf").cast("double"), 4).alias("top_token_frac")
    ).select(id_col, "top_token_frac", "dup_2gram_frac")


def tfidf_top_terms(df, text_col: str, id_col: str, top_n: int = 3):
    """Top-``top_n`` characteristic terms per document by ratio-idf
    tf-idf: score = tf × N / df(term). The ratio form (instead of
    ln(N/df)) keeps the arithmetic a single IEEE-rounded divide of exact
    integers, so any engine reproduces it bit-for-bit.

    Plan: token frequencies (one shuffle) → document frequencies over
    the tf table (second shuffle, vocabulary-sized) → join scores back
    (AQE picks broadcast when the vocabulary is small) → per-doc top-n
    window. Output is bounded at ``top_n × #docs``.
    """
    from pyspark.sql import Window

    tf = token_frequencies(df, text_col, id_col)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"), 4))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select(F.col(id_col), F.col("token").alias("term"), "tfidf", "rank")
    )


def rolling_fingerprint(col: Column | str, k: int = 3, bottom: int = 8) -> Column:
    """Document fingerprint: bottom-``bottom`` sketch of the k-word
    shingle hash set (winnowing-style content signature), rendered as a
    '-'-joined string so it is directly comparable across engines.

    Scale: narrow per-row computation; the fingerprint column is what a
    100 TB pipeline groups/joins on for containment-style dedup.
    """
    from is3107datapipelineproject_spark.operators.dedup import shingle_hash_set

    hashes = shingle_hash_set(col, k=k)
    return F.concat_ws("-", F.slice(F.array_sort(hashes), 1, bottom))


def build_vocab(df, text_col: str, id_col: str, min_df: int = 1):
    """Corpus vocabulary: every distinct token with its corpus frequency,
    document frequency, and a DENSE rank id (1 = most frequent; ties
    broken lexically so ids are reproducible) — the tokenizer-vocab
    build step of a training-data pipeline.

    Scale: the token explode + two-level aggregation are linear with
    map-side partial agg; the ranking window is a single-partition sort
    over the DISTINCT vocabulary only, which Heaps' law keeps in the
    millions (MBs) even for a 100 TB corpus — never over the corpus
    itself."""
    from pyspark.sql import Window

    tf = token_frequencies(df, text_col, id_col)
    vocab = tf.groupBy("token").agg(
        F.sum("tf").alias("corpus_tf"),
        F.count(F.lit(1)).alias("df"),
    )
    if min_df > 1:
        vocab = vocab.filter(F.col("df") >= min_df)
    w = Window.orderBy(F.desc("corpus_tf"), F.asc("token"))
    return vocab.withColumn("term_id", F.row_number().over(w).cast("bigint"))


def doc_term_matrix(df, text_col: str, id_col: str, vocab=None):
    """Sparse document-term matrix ``(id, term_id, tf)`` — the feature
    triples downstream training jobs consume. The vocabulary (built here
    unless supplied) is dimension-sized, so the term-id attachment is a
    broadcast join onto the per-doc term frequencies; the whole plan is
    one shuffle (the tf aggregation) plus a broadcast."""
    tf = token_frequencies(df, text_col, id_col)
    v = vocab if vocab is not None else build_vocab(df, text_col, id_col)
    return tf.join(
        F.broadcast(v.select("token", "term_id")), "token"
    ).select(F.col(id_col), "term_id", "tf")
