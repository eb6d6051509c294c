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
