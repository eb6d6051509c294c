"""Data-quality constraints and counts-based text classification.

Three operator families a 100-TB curation pipeline runs constantly:

- :func:`constraint_report` — a deequ-style declarative check battery.
  Every ROW-LEVEL predicate folds into ONE partial-aggregated corpus
  pass (the violation counters are conditional sums, so the scan is the
  whole cost); uniqueness and referential-integrity checks each add one
  key-shaped aggregate and union their 1-row results in. Output is a
  handful of rows regardless of corpus size.
- :func:`chi2_terms` — per-class discriminative vocabulary by the
  classic 2×2 chi-square over document frequencies. The corpus reduces
  to a (term, class) count table (map-side combined), the contingency
  algebra is constant work per surviving term, and the per-class top-n
  is a bounded window over vocabulary-sized data.
- :func:`naive_bayes_confusion` — multinomial Naive Bayes trained and
  scored entirely as counts: the model IS a (term, label) aggregate,
  scoring is a vocabulary-keyed join + one exact DECIMAL sum per
  (doc, label), and the readout is a #labels² confusion matrix. No
  driver-side training loop, no UDF — the whole classifier is one
  Catalyst plan.

Determinism contract (shared with operators/stats.py): every per-token
log-probability is rounded to 6 dp and cast to DECIMAL before the
per-document sum, so the accumulated score is bit-identical under any
partitioning and a SQL oracle replays the argmax hash-exactly; ties
break by label ascending.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.text import ws_tokens

# Per-token log-prob carried as an exact 6-dp decimal; a document sum of
# 1e5 tokens × |logp| ≤ 30 fits comfortably in DECIMAL(28,6).
_LOGP = "decimal(18,6)"
_SCORE = "decimal(28,6)"


# --------------------------------------------------------------------------
# deequ-style constraint battery
# --------------------------------------------------------------------------

def violation_when(pred: Column) -> Column:
    """Row-level violation indicator: 1 where ``pred`` (the VIOLATION
    condition) holds, else 0. NULL predicates count as violations — a
    null in a checked expression is itself a data-quality failure."""
    return F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)


def row_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level violation predicates in ONE aggregate
    pass over ``df``: ``(check, total, violations, passed)`` — one row
    per check. ``checks`` maps name → violation condition (true = bad).

    Plan shape: conditional sums share a single scan with map-side
    partial aggregation; the 1-row result unpivots via an inline array
    of structs (zero extra shuffles). At 100 TB this is exactly one
    corpus read no matter how many checks are declared."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__total")]
    for name, pred in checks.items():
        aggs.append(F.sum(violation_when(pred)).cast("long").alias(f"__v_{name}"))
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("check"),
            F.col("__total").alias("total"),
            F.col(f"__v_{name}").alias("violations"),
        )
        for name in checks
    ]
    return (
        one.select(F.explode(F.array(*rows)).alias("r"))
        .select(
            "r.check",
            "r.total",
            "r.violations",
            (F.col("r.violations") == 0).alias("passed"),
        )
    )


def uniqueness_check(df: DataFrame, name: str, key_cols: list[str]) -> DataFrame:
    """Key-uniqueness as one row: violations = rows − distinct keys.
    The distinct count is an exact two-phase aggregate on the key (the
    only shuffle; partial dedup happens map-side), so the check scales
    with the key cardinality, not the row count."""
    keys = [F.col(c) for c in key_cols]
    one = df.agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.count_distinct(*keys).cast("long").alias("__d"),
    )
    return one.select(
        F.lit(name).alias("check"),
        "total",
        (F.col("total") - F.col("__d")).alias("violations"),
        (F.col("total") == F.col("__d")).alias("passed"),
    )


def referential_check(
    child: DataFrame,
    name: str,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Foreign-key containment as one row: violations = child rows whose
    key has no parent (left-anti join count; null child keys are
    orphans by definition and the anti-join keeps them). The parent
    side projects to its key column only, so a dimension-sized parent
    broadcasts and the fact scan never reshuffles."""
    orphans = child.select(F.col(child_key).alias("__k")).join(
        parent.select(F.col(parent_key).alias("__k")).distinct(),
        "__k",
        "left_anti",
    )
    total = child.agg(F.count(F.lit(1)).cast("long").alias("total"))
    viol = orphans.agg(F.count(F.lit(1)).cast("long").alias("violations"))
    return (
        total.crossJoin(F.broadcast(viol))
        .select(
            F.lit(name).alias("check"),
            "total",
            "violations",
            (F.col("violations") == 0).alias("passed"),
        )
    )


def constraint_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-family check frames into the final report, ordered
    by check name so the output is presentation-stable."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check")


# --------------------------------------------------------------------------
# chi-square discriminative terms
# --------------------------------------------------------------------------

def chi2_terms(
    df: DataFrame,
    text_col: str,
    class_col: str,
    id_col: str,
    top_n: int = 15,
    min_df: int = 5,
    decimals: int = 4,
) -> DataFrame:
    """Top-``top_n`` terms per class by the 2×2 document-frequency
    chi-square — the classic feature-selection sweep a curation
    pipeline runs to audit what vocabulary separates its sources:
    ``(class, term, df_in_class, chi2, rank)``.

    For term t and class c over N documents, with a = |docs in c with
    t|, b = |docs not in c with t|, c_ = |docs in c without t|,
    d = N − a − b − c_:

        chi² = N·(a·d − b·c_)² / ((a+b)(c_+d)(a+c_)(b+d))

    Plan shape: per-document distinct terms explode once (the corpus
    scan), fold to (term, class) counts with map-side combine, join the
    vocabulary-sized term totals (term-keyed, tiny vs the corpus), and
    broadcast the #classes-row class totals. The ranking window
    partitions by class over ≤ |vocab| rows. Terms below ``min_df``
    total document frequency are pruned BEFORE the totals join. The
    score is one pinned double expression rounded to ``decimals``
    before ranking; ties break by term ascending."""
    dt = df.select(
        F.col(class_col).alias("cls"),
        F.explode(F.array_distinct(ws_tokens(text_col))).alias("term"),
    )
    tc = dt.groupBy("term", "cls").agg(F.count(F.lit(1)).cast("long").alias("a"))
    t_tot = (
        tc.groupBy("term")
        .agg(F.sum("a").cast("long").alias("t_all"))
        .filter(F.col("t_all") >= min_df)
    )
    c_tot = df.groupBy(F.col(class_col).alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    )
    n_tot = df.agg(F.count(F.lit(1)).cast("long").alias("n"))

    j = (
        tc.join(t_tot, "term")
        .join(F.broadcast(c_tot), "cls")
        .crossJoin(F.broadcast(n_tot))
    )
    a = F.col("a").cast("double")
    b = (F.col("t_all") - F.col("a")).cast("double")
    c_ = (F.col("n_c") - F.col("a")).cast("double")
    d = (F.col("n") - F.col("t_all") - F.col("n_c") + F.col("a")).cast("double")
    n = F.col("n").cast("double")
    den = (a + b) * (c_ + d) * (a + c_) * (b + d)
    chi2 = F.round(F.when(den > 0, n * (a * d - b * c_) * (a * d - b * c_) / den), decimals)

    w = Window.partitionBy("class").orderBy(F.desc_nulls_last("chi2"), F.asc("term"))
    return (
        j.select(
            F.col("cls").alias("class"),
            "term",
            F.col("a").alias("df_in_class"),
            chi2.alias("chi2"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
    )


# --------------------------------------------------------------------------
# multinomial Naive Bayes as counts
# --------------------------------------------------------------------------

def naive_bayes_confusion(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
) -> DataFrame:
    """Train multinomial NB on the even-``id_col`` half, score the odd
    half, return the confusion matrix ``(actual, predicted, n_docs)``.

    Model = counts: token counts per (term, label) with add-one
    smoothing over the trained vocabulary V, log prior from training
    doc counts. Scoring restricts to in-vocabulary tokens (OOV tokens
    carry no class signal under uniform smoothing of a shared vocab —
    the standard inference-time contract), so the score join is keyed
    on the VOCABULARY, never the corpus.

    Scale shape: the model table is |V|·|labels| rows built by one
    partial-aggregated pass over the training half; test tokens join it
    term-keyed (vocabulary-sized build side), the per-(doc, label)
    score is an exact DECIMAL sum of 6-dp-rounded log-probs (order
    independent — see module docstring), and the argmax is a
    #labels-wide window per document. Output is |labels|² rows.
    """
    toks = df.select(
        F.col(id_col).alias("did"),
        F.col(label_col).alias("lbl"),
        F.explode(ws_tokens(text_col)).alias("term"),
    )
    train_t = toks.filter(F.col("did") % 2 == 0)
    test_t = toks.filter(F.col("did") % 2 == 1)

    # (term, label) token counts and per-label token totals
    tl = train_t.groupBy("term", "lbl").agg(F.count(F.lit(1)).cast("long").alias("c_tl"))
    l_tot = tl.groupBy("lbl").agg(F.sum("c_tl").cast("long").alias("t_l"))
    vocab = tl.select("term").distinct()
    v_size = vocab.agg(F.count(F.lit(1)).cast("long").alias("v"))

    # dense (term × label) log-prob grid: |V|·|labels| rows, the model
    grid = (
        vocab.crossJoin(F.broadcast(l_tot))
        .join(tl, ["term", "lbl"], "left")
        .crossJoin(F.broadcast(v_size))
        .select(
            "term",
            "lbl",
            F.round(
                F.log(
                    (F.coalesce(F.col("c_tl"), F.lit(0)) + 1).cast("double")
                    / (F.col("t_l") + F.col("v")).cast("double")
                ),
                6,
            )
            .cast(_LOGP)
            .alias("logp"),
        )
    )

    # log prior per label from training doc counts
    train_docs = df.filter(F.col(id_col) % 2 == 0).select(
        F.col(id_col).alias("did"), F.col(label_col).alias("lbl")
    )
    n_train = train_docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    prior = (
        train_docs.groupBy("lbl")
        .agg(F.count(F.lit(1)).cast("long").alias("n_l"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "lbl",
            F.round(F.log(F.col("n_l").cast("double") / F.col("n").cast("double")), 6)
            .cast(_LOGP)
            .alias("log_prior"),
        )
    )

    # score: test tokens × model grid (term-keyed), exact decimal sum
    scores = (
        test_t.select("did", F.col("lbl").alias("actual"), "term")
        .join(grid, "term")
        .groupBy("did", "actual", "lbl")
        .agg(F.sum(F.col("logp").cast(_SCORE)).alias("s_tok"))
        .join(F.broadcast(prior), "lbl")
        .select(
            "did",
            "actual",
            "lbl",
            (F.col("s_tok") + F.col("log_prior").cast(_SCORE)).alias("score"),
        )
    )
    w = Window.partitionBy("did").orderBy(F.desc("score"), F.asc("lbl"))
    pred = scores.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        pred.groupBy(F.col("actual"), F.col("lbl").alias("predicted"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("actual", "predicted")
    )
