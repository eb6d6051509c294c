"""Unit tests for operators/quality.py — the edge cases the sf0.01
oracle-parity run cannot reach: planted nulls, planted orphans,
hand-computed chi-square, and the Naive Bayes determinism contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators import quality as Q


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_row_checks_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], ["id", "amount"]
    )
    out = Q.row_checks(df, {"amount_positive": ~(F.col("amount") > 0)})
    ((check, total, violations, passed),) = out.collect()
    # row 2 (NULL) and row 3 (negative) both violate
    assert (check, total, violations, passed) == ("amount_positive", 3, 2, False)


def test_row_checks_single_scan_many_checks(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(100)], ["id", "v"])
    out = Q.row_checks(
        df,
        {
            "v_nonneg": F.col("v") < 0,
            "v_small": F.col("v") > 5,
            "id_complete": F.col("id").isNull(),
        },
    )
    got = {r["check"]: (r["violations"], r["passed"]) for r in out.collect()}
    assert got == {
        "v_nonneg": (0, True),
        "v_small": (14, False),  # v == 6 for 14 of 100
        "id_complete": (0, True),
    }
    # all three checks fold into ONE aggregate over one scan (count the
    # AQE final plan only — the string repeats nodes in == Initial Plan ==)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") <= 1


def test_uniqueness_check_composite_key(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 1)], ["k1", "k2"]
    )
    ((_, total, violations, passed),) = Q.uniqueness_check(df, "uq", ["k1", "k2"]).collect()
    assert (total, violations, passed) == (4, 1, False)


def test_referential_check_counts_orphans_and_null_keys(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "k: int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: int")
    ((_, total, violations, passed),) = Q.referential_check(
        child, "ri", "k", parent, "pk"
    ).collect()
    # 99 is an orphan; NULL child key never matches -> orphan too
    assert (total, violations, passed) == (4, 2, False)


def test_chi2_matches_hand_computation(spark):
    # 4 docs, 2 classes; term "x" in both class-a docs, neither class-b doc.
    df = spark.createDataFrame(
        [
            (0, "a", "x common"),
            (1, "a", "x common"),
            (2, "b", "y common"),
            (3, "b", "y common"),
        ],
        ["doc_id", "cls", "text"],
    )
    out = Q.chi2_terms(df, "text", "cls", "doc_id", top_n=5, min_df=1)
    got = {(r["class"], r["term"]): r["chi2"] for r in out.collect()}
    # perfect association: chi2 = N = 4; "common" is in every doc -> den=0 -> NULL
    assert got[("a", "x")] == 4.0
    assert got[("b", "y")] == 4.0
    assert got[("a", "common")] is None
    # NULL chi2 ranks after real scores on both engines (DESC NULLS LAST)
    ranks = {(r["class"], r["term"]): r["rank"] for r in out.collect()}
    assert ranks[("a", "x")] < ranks[("a", "common")]


def test_naive_bayes_separable_corpus_is_diagonal(spark):
    # even ids train, odd ids test; vocabularies fully separate the labels
    rows = []
    for i in range(40):
        lbl = "de" if i % 4 < 2 else "en"
        word = "hund katze" if lbl == "de" else "dog cat"
        rows.append((i, lbl, word))
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = Q.naive_bayes_confusion(df, "text", "doc_id", "lang")
    got = {(r["actual"], r["predicted"]): r["n_docs"] for r in out.collect()}
    assert got == {("de", "de"): 10, ("en", "en"): 10}


def test_naive_bayes_tie_breaks_to_smallest_label(spark):
    # symmetric corpus: both labels have identical counts for the test
    # doc's tokens -> scores are decimal-equal -> smallest label wins.
    df = spark.createDataFrame(
        [
            (0, "aa", "same words"),
            (2, "bb", "same words"),
            (1, "bb", "same words"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = Q.naive_bayes_confusion(df, "text", "doc_id", "lang")
    ((actual, predicted, n),) = out.collect()
    assert (actual, predicted, n) == ("bb", "aa", 1)


def test_naive_bayes_smoothing_uses_label_specific_denominator(spark):
    # "rare" appears only in the aa training doc; a test doc of "rare"
    # must still score finitely for bb via add-one smoothing.
    df = spark.createDataFrame(
        [
            (0, "aa", "rare rare rare"),
            (2, "bb", "other other other"),
            (1, "aa", "rare"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = Q.naive_bayes_confusion(df, "text", "doc_id", "lang")
    ((actual, predicted, n),) = out.collect()
    assert (actual, predicted) == ("aa", "aa")
    # hand-check the winning score: V=2, T_aa=3 -> logp(rare|aa)=ln(4/5)
    expected = round(math.log((3 + 1) / (3 + 2)), 6) + round(math.log(1 / 2), 6)
    assert expected > round(math.log(1 / 5), 6) + round(math.log(1 / 2), 6)


def test_repetition_stats_matches_hand_computed_and_drops_null_text(spark):
    """Round-10 rewrite contract for operators/text.py::repetition_stats
    (narrow per-row scan, no explode): hand-computed signal values, and
    NULL-text docs produce NO row — the old explode shape dropped them
    and the oracle's unnest drops them, so the rewrite must too."""
    from is3107datapipelineproject_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # top token 'a' 3/4; bigrams [a a, a a, a b] -> dup 1-2/3
            (2, "x y z"),            # all distinct: top 1/3; bigrams distinct -> dup 0.0
            (3, None),               # NULL text: no output row
            (4, "loop loop"),        # top 2/2 = 1.0; one bigram -> dup 0.0
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_id, r.top_token_frac, r.dup_2gram_frac)
        for r in repetition_stats(df, "text", "doc_id").collect()
    }
    assert got == {
        (1, 0.75, round(1 - 2 / 3, 4)),
        (2, round(1 / 3, 4), 0.0),
        (4, 1.0, 0.0),
    }
