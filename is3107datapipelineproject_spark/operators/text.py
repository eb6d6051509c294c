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

from collections.abc import Sequence
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

    Both signals are per-row ARRAY expressions over the tokenized
    document — ONE narrow scan, zero shuffles; the per-row cost is
    O(distinct × len) string compares, trivially small next to the
    tokenization itself.

    Round-10 rewrite (the first sf0.1 annex-bench of this query caught
    it at 243 s): the original shape exploded the tokens and carried
    the bigram fraction through the aggregation as a grouping constant
    — but that expression sat in the projection ABOVE the Generate, so
    the O(len²) bigram/array_distinct work re-evaluated PER TOKEN ROW
    (~50× per doc), on the single input partition a small parquet file
    plans to. The lesson generalizes: an expensive expression in the
    same select as an explode lands post-Generate and multiplies by
    the fan-out — compute it per document in the Generate's CHILD, or
    avoid the explode entirely (done here; spread_small_input restores
    parallelism for small files). 243 s → <1 s; values bit-identical
    (same integer counts, same 4-dp rounding), driver-oracle-verified.
    """
    from is3107datapipelineproject_spark.operators.dedup import spread_small_input

    # EVERY per-row stage here is linear-or-n-log-n in the token count,
    # with the token array materialized as a COLUMN first: an expression
    # inlined into a higher-order-function lambda re-evaluates per
    # ELEMENT (codegen does not CSE across lambda scopes), so
    # word_shingles' inline tokenize — and the obvious
    # transform(array_distinct, t -> count(filter(toks, ==t))) counter —
    # are O(n²) per row (measured: 47 s for ONE 16k-token doc; see
    # SCALING part 21, which names the word_shingles generalization).
    t = F.col("__toks")
    # bigrams by zipping the two shifted views (word_shingles k=2
    # semantics: one truncated shingle for single-token docs)
    bigrams = F.when(F.size(t) <= 1, F.array(F.concat_ws(" ", t))).otherwise(
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    )
    dup = F.round(
        F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / F.size(bigrams).cast("double"),
        4,
    )
    # top token count by sort-then-count-runs
    run_step = lambda acc, x: F.struct(  # noqa: E731 — hof step, not a def
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    top_tf = F.aggregate(
        F.array_sort(t),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        run_step,
        lambda acc: acc["best"],
    )
    frac = F.round(top_tf.cast("double") / F.size(t).cast("double"), 4)
    # NULL-text docs produced no row under the old explode shape (and
    # produce none in the oracle's unnest) — keep that contract.
    return (
        spread_small_input(df)
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), ws_tokens(text_col).alias("__toks"))
        .select(F.col(id_col), frac.alias("top_token_frac"), dup.alias("dup_2gram_frac"))
    )


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


# C4-style badword gate list. Deliberately tiny and fixed (the operator
# contract is the GATE MECHANICS, not a curated lexicon — production swaps
# in the real list as a literal array or a broadcast side table).
BLOCKLIST_DEFAULT: tuple[str, ...] = ("slow", "error", "crash")


def blocklist_stats(
    df, text_col: str, id_col: str, blocklist: tuple[str, ...] = BLOCKLIST_DEFAULT
):
    """C4-style wordlist gate: per-document count of blocklisted token
    occurrences and a boolean flag.

    Scale: the list is a LITERAL array folded into the row expression —
    zero joins, zero shuffles, pure codegen scan; at 100 TB this is
    scan-bound like every other text gate. A list too large to inline
    (10k+ terms) becomes a broadcast left-semi join on exploded tokens
    instead; this operator pins the inline tier.
    """
    toks = ws_tokens(text_col)
    n_blocked = F.size(F.filter(toks, _isin_lambda(tuple(blocklist)))).cast("bigint")
    return df.select(
        F.col(id_col),
        n_blocked.alias("n_blocked"),
        (n_blocked > F.lit(0)).alias("has_blocked"),
    )


def vocab_growth(df, text_col: str, id_col: str, buckets: int = 10):
    """Heaps'-law curve: split the corpus into ``buckets`` id-ordered
    slices and report, per slice, the token volume and the number of
    NEW vocabulary types first seen there (plus both cumulatively).
    A healthy natural corpus keeps minting types (cum_types ~ N^beta);
    a flat tail is the signature of template/boilerplate floods.

    Plan: one 1-row max(id) aggregate broadcast-attached to assign
    buckets by integer arithmetic (reproducible on any engine), one
    explode + min(bucket)-per-token aggregate (map-side partial, linear),
    then two bucket-sized aggregates joined and cumulated with a window
    over ``buckets`` rows — the only single-partition sort is over the
    bucket count itself, never the corpus or the vocabulary."""
    from pyspark.sql import Window

    mx = df.agg(F.max(F.col(id_col)).alias("_mx"))
    b = (
        df.crossJoin(F.broadcast(mx))
        .select(
            F.expr(f"least({buckets - 1}, ({id_col} * {buckets}) div (_mx + 1))")
            .cast("int")
            .alias("bucket"),
            ws_tokens(text_col).alias("toks"),
        )
    )
    per_bucket = b.groupBy("bucket").agg(
        F.sum(F.size("toks").cast("bigint")).alias("n_tokens")
    )
    first_seen = (
        b.select("bucket", F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(first_seen, "bucket", "left")
        .withColumn("new_types", F.coalesce("new_types", F.lit(0)).cast("bigint"))
        .select(
            "bucket",
            "n_tokens",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
            "new_types",
            F.sum("new_types").over(w).alias("cum_types"),
        )
    )


def zipf_slope(df, text_col: str, top_k: int = 500):
    """Zipf rank-frequency fit over the ``top_k`` most frequent tokens:
    least-squares slope of ln(freq) on ln(rank) plus r² — natural text
    sits near slope -1; slope near 0 with high r² over the head means a
    machine-generated / templated corpus.

    Plan: token counts are one explode + hash-aggregate (linear,
    map-side partials); the head is a TakeOrdered top-k (per-partition
    heaps, no global sort); rank/regression run over ``top_k`` rows.
    The corpus-sized stages are exactly the vocab-build ones — nothing
    here grows past top_k after the aggregate."""
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(ws_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    pts = counts.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    # r² spelled out as covar²/(varx·vary) with a nullif guard: a corpus
    # whose head frequencies are all EQUAL has var(y)=0, where corr() is
    # undefined (ANSI Spark raises, DuckDB returns NULL) — the explicit
    # form gives NULL on both engines and keeps the formula bit-identical.
    return pts.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 4).alias("slope"),
        F.round(
            F.pow(F.covar_pop("x", "y"), F.lit(2.0))
            / F.nullif(F.var_pop("x") * F.var_pop("y"), F.lit(0.0)),
            4,
        ).alias("r2"),
    )


def bm25_search(
    df,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
):
    """Rank every document against a literal query by BM25 — the search
    primitive (Robertson/Spärck Jones probabilistic relevance; the
    default lexical ranker in Lucene/Elasticsearch).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Determinism contract: the per-term partial scores are materialized
    as ONE CONDITIONAL-AGGREGATE COLUMN PER QUERY TERM and summed in
    fixed expression order (s₁ + s₂ + …) — never a float groupBy-sum
    whose accumulation order would vary with partitioning — and the
    final score is rounded to 4 dp before ranking, so a SQL engine
    evaluating the same expression tree agrees hash-for-hash.

    Plan shape at 100 TB: the explode is filtered to the |Q| query
    terms BEFORE the tf shuffle (the inverted-index probe — everything
    else in the corpus never leaves the scan); df/N/avgdl are one
    |Q|-column 1-row aggregate broadcast back; ranking is
    TakeOrderedAndProject. Zero corpus-sized shuffles beyond the
    (doc × matched-term) tf aggregate.
    """
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    terms = list(query_terms)
    base = df.select(
        F.col(id_col), ws_tokens(text_col).alias("_toks")
    ).withColumn("dl", F.size("_toks").cast("long"))
    tf = (
        base.select(F.col(id_col), "dl", F.explode("_toks").alias("t"))
        .filter(F.col("t").isin(terms))
        .groupBy(id_col, "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    dfs = tf.agg(
        *[
            F.sum(F.when(F.col("t") == t, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"df{i}")
            for i, t in enumerate(terms)
        ]
    )
    piv = tf.groupBy(id_col, "dl").agg(
        *[
            F.max(F.when(F.col("t") == t, F.col("tf"))).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ]
    )
    scored = piv.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(dfs))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    parts = []
    for i in range(len(terms)):
        tf_i, df_i = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - df_i + F.lit(0.5)) / (df_i + F.lit(0.5))
        )
        s = idf * (tf_i * F.lit(k1 + 1.0)) / (
            tf_i + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )
        parts.append(F.coalesce(s, F.lit(0.0)))
    total = parts[0]
    for p in parts[1:]:
        total = total + p
    out = scored.withColumn("score", F.round(total, 4)).filter(F.col("score") > 0)
    return (
        out.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_n)
        .select(id_col, "score")
    )


def bpe_merge_pairs(df, text_col: str, id_col: str, top_n: int = 50):
    """Top adjacent-character-pair merge candidates — the first
    iteration of BPE tokenizer training (Sennrich et al., 2016). The
    scale insight the operator encodes: pair counts are computed over
    the DISTINCT word vocabulary weighted by word frequency, never over
    the corpus — after the one corpus-side token count, the quadratic-in
    -word-length pair explode touches only |vocab| rows. Returns
    ``(pair, merge_count)``, the ``top_n`` pairs under a total
    (count desc, pair asc) order so the cutoff is deterministic.
    """
    toks = df.select(F.explode(ws_tokens(text_col)).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    prs = (
        vocab.filter(F.length("token") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("token") - 1),
                    lambda i: F.col("token").substr(i, F.lit(2)),
                )
            ).alias("pair"),
        )
    )
    return (
        prs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("merge_count"))
        .orderBy(F.col("merge_count").desc(), F.col("pair"))
        .limit(top_n)
    )


def readability_scores(df, text_col: str, id_col: str):
    """Flesch-Kincaid-style grade-level estimate per document from
    three regexp match counts over the normalized text (words, sentence
    breaks, vowel-group syllable proxy) — one narrow codegen scan, no
    shuffle, no UDF. The formula is evaluated in one fixed double
    expression and rounded, so an oracle reproduces it bit-for-bit.
    Documents with zero words are excluded (undefined score)."""
    norm = normalize_text(text_col)
    t = df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(norm, F.lit("[a-z0-9]+"), F.lit(0))).cast("long").alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all(norm, F.lit("[.!?]+"), F.lit(0))), F.lit(1)
        ).cast("long").alias("sentences"),
        F.size(F.regexp_extract_all(norm, F.lit("[aeiou]+"), F.lit(0))).cast("long").alias("syllables"),
    ).filter(F.col("words") > 0)
    grade = F.round(
        F.lit(0.39) * (F.col("words").cast("double") / F.col("sentences"))
        + F.lit(11.8) * (F.col("syllables").cast("double") / F.col("words"))
        - F.lit(15.59),
        4,
    )
    return t.select(id_col, "words", "sentences", "syllables", grade.alias("fk_grade"))


def char_entropy(df, text_col: str, id_col: str):
    """Shannon entropy of each document's character distribution — the
    classic gibberish/low-diversity quality signal (near-0 for repeated
    filler, ~4+ bits for natural language). Per-(doc, char) counts
    partial-aggregate map-side, so the shuffle carries at most
    |alphabet| rows per document; the -Σ p·log2 p sum folds over the
    char-sorted count list in a FIXED order (floats are not associative
    — an unordered SUM would drift across engines/partitionings), then
    rounds. Returns ``(id_col, n_chars, uniq_chars, entropy)``."""
    cs = df.select(F.col(id_col), F.explode(F.split(normalize_text(text_col), "")).alias("c"))
    cc = cs.groupBy(id_col, "c").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    agg = cc.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("uniq_chars"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("c", "cnt"))), lambda s: s["cnt"]
        ).alias("arr"),
    )
    p = lambda x: x.cast("double") / F.col("n_chars")  # noqa: E731
    ent = F.round(
        -F.aggregate("arr", F.lit(0.0), lambda acc, x: acc + p(x) * F.log2(p(x))), 4
    )
    return agg.select(id_col, "n_chars", "uniq_chars", ent.alias("entropy"))


def word_pmi(df, text_col: str, id_col: str, min_count: int = 5, top_n: int = 100):
    """Top collocations by pointwise mutual information over adjacent
    word pairs — the classic phrase-mining signal (word2vec phrase
    harvesting, collocation dictionaries):

        pmi(x,y) = log2( (c_xy / T_bg) / ((c_x / T_un)·(c_y / T_un)) )

    with c from corpus-wide counts, computed as ONE double expression
    per surviving pair in a pinned association order and rounded to 4 dp
    BEFORE the (pmi desc, w1, w2) ranking — so the top-``top_n`` cut is
    bit-stable and SQL-replayable.

    Plan: bigrams from the narrow tail-zip (shared with
    ``curation.bigram_surprisal``), unigram + bigram counts as two hash
    aggregates (map-side partials), the score join keyed on the WORD
    (vocabulary-sized, Zipf-bounded — shuffled, AQE may broadcast), the
    two scalar totals broadcast as 1-row frames, and the final ranking
    lowered to TakeOrderedAndProject (per-partition heap over the
    ≥min_count pair table, never a full sort). ``min_count`` prunes the
    hapax tail BEFORE the score join, which is what bounds the join
    input at 100 TB."""
    arr = ws_tokens(text_col)
    toks = df.select(F.explode(arr).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    t_un = uni.agg(F.sum("c").cast("long").alias("n_un"))
    pairs = F.filter(
        F.zip_with(
            arr,
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda p: p["w2"].isNotNull(),
    )
    bg = df.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    cb = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    t_bg = bg.agg(F.count(F.lit(1)).cast("long").alias("n_bg"))
    scored = (
        cb.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(t_un))
        .crossJoin(F.broadcast(t_bg))
    )
    pmi = F.round(
        F.log2(
            F.col("cnt").cast("double")
            * F.col("n_un")
            * F.col("n_un")
            / (F.col("n_bg").cast("double") * F.col("c1") * F.col("c2"))
        ),
        4,
    )
    return (
        scored.select("w1", "w2", "cnt", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_n)
    )


def bpe_learn_merges(
    df, text_col: str, id_col: str, rounds: int = 3, passes: int = 8
):
    """Actual BPE merge LEARNING (Sennrich et al., 2016) — not just the
    round-1 candidate ranking of :func:`bpe_merge_pairs`: run ``rounds``
    full iterations of (count adjacent symbol pairs → pick the argmax →
    rewrite every word's symbol sequence with the merged token), and
    return the learned merge table ``(merge_rank, pair, merge_count)``.

    Scale shape: the corpus collapses to the DISTINCT word-frequency
    table in one aggregate, and every iteration after that is
    vocabulary-sized — exactly why production BPE trainers
    (GPT-2/sentencepiece) train on word counts. Words are carried as
    space-delimited symbol strings ('l o w'), so the merge rewrite is a
    plain string ``replace(' a b ', ' ab ')`` — whole-stage-codegen
    JVM, no UDF. ``replace`` is left-to-right non-overlapping in BOTH
    engines (boundary-sharing occurrences like 'a b a b' need a second
    pass because adjacent matches share the separator space), so the
    rewrite applies ``passes`` fixed passes — a fixed point for any
    word up to 2^passes symbols — keeping Spark and the unrolled-CTE
    DuckDB oracle bit-identical. Each round's winning pair is resolved
    to a LITERAL via a 1-row argmax collect (control-plane scalar, same
    pattern as the z-order bounds guard), and the rewritten vocabulary
    is eagerly localCheckpoint'd so round r+1's plan does not replay
    rounds 1..r."""
    merges, _ = _bpe_train(df, text_col, rounds, passes)
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, merge_count long"
    )


def _bpe_train(df, text_col: str, rounds: int, passes: int):
    """Shared BPE training loop: returns (merge list, final rewritten
    word-frequency frame ``(seq, freq)``) — the second return is what a
    fertility/compression audit consumes without replaying the loop."""
    toks = df.select(F.explode(ws_tokens(text_col)).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    cur = vocab.select(
        F.concat(F.lit(" "), F.regexp_replace("token", "(.)", "$1 ")).alias("seq"),
        "freq",
    ).localCheckpoint(eager=False)
    merges = []
    for r in range(1, rounds + 1):
        syms = F.split(F.trim(F.col("seq")), " ")
        prs = (
            cur.select(syms.alias("syms"), "freq")
            .filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.concat(
                            F.element_at("syms", i), F.lit(" "), F.element_at("syms", i + 1)
                        ),
                    )
                ).alias("pair"),
            )
        )
        top = (
            prs.groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .first()
        )
        if top is None:
            break
        merges.append((r, top.pair, top.cnt))
        search = F.lit(f" {top.pair} ")
        repl = F.lit(" " + top.pair.replace(" ", "") + " ")
        newseq = F.col("seq")
        for _ in range(passes):
            newseq = F.replace(newseq, search, repl)
        cur = cur.select(newseq.alias("seq"), "freq").localCheckpoint(eager=False)
    return merges, cur


def bpe_fertility_stats(df, text_col: str, rounds: int = 3, passes: int = 8):
    """Tokenizer-fertility audit: train ``rounds`` BPE merges, ENCODE
    the word-frequency table with them, and report corpus totals —
    words, characters, post-merge tokens, and chars/token (the
    compression a tokenizer buys, the number a pretraining-budget
    planner actually consumes). The encode is free: the training loop's
    final rewritten vocabulary IS the encoding of every distinct word,
    so corpus totals are frequency-weighted sums over the vocab —
    corpus-scale work remains the one word-count aggregate."""
    _, cur = _bpe_train(df, text_col, rounds, passes)
    word = F.replace(F.trim(F.col("seq")), F.lit(" "), F.lit(""))
    n_tok = F.size(F.split(F.trim(F.col("seq")), " "))
    return cur.agg(
        F.sum("freq").cast("long").alias("n_words"),
        F.sum(F.col("freq") * F.length(word)).cast("long").alias("n_chars"),
        F.sum(F.col("freq") * n_tok).cast("long").alias("n_tokens"),
        F.round(
            F.sum(F.col("freq") * F.length(word)).cast("double")
            / F.sum(F.col("freq") * n_tok).cast("double"),
            4,
        ).alias("chars_per_token"),
    )
