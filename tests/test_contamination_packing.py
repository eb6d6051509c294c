"""Unit tests for corpus-hygiene (decontamination / boilerplate) and
sequence-packing operators — planted-case semantics plus the
distributed-prefix-sum equivalence the oracle can't isolate."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.contamination import (
    boilerplate_docs,
    decontaminate,
    hot_ngrams,
)
from is3107datapipelineproject_spark.operators.packing import pack_sequences


def test_decontaminate_flags_planted_overlap(spark):
    ev = spark.createDataFrame(
        [(100, "the exact eval question about spark shuffles appears here")],
        ["doc_id", "text"],
    )
    tr = spark.createDataFrame(
        [
            (1, "prefix text the exact eval question about nothing else"),  # 3-gram overlap
            (2, "completely clean document with no overlap whatsoever okay"),
            (3, "the exact eval question about spark shuffles appears here"),  # full copy
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.n_hits for r in decontaminate(tr, ev, "text", "doc_id", k=3).collect()}
    assert 1 in out and 3 in out and 2 not in out
    assert out[3] > out[1]  # full copy hits more distinct 3-grams


def test_boilerplate_hot_ngram_detection(spark):
    rows = [(i, f"click here to subscribe unique tail {i} content") for i in range(20)]
    rows.append((99, "entirely original text with no shared phrases at all"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    hot = hot_ngrams(df, "text", "doc_id", k=3, min_doc_share=0.5)
    assert hot.count() > 0  # "click here to" etc. occur in 20/21 docs
    flagged = {r.doc_id for r in boilerplate_docs(df, "text", "doc_id", 3, 0.5).collect()}
    assert flagged == set(range(20))  # carriers only, the original doc clean


def test_pack_sequences_matches_single_window_cumsum(spark):
    # Sparse, gappy ids — bucket balance may be terrible, correctness
    # must not care.
    ids = [1, 2, 3, 50, 51, 999, 1000, 1001, 7777, 8000, 100000]
    t = spark.createDataFrame(
        [(i, (i * 37) % 23 + 1) for i in ids], "doc_id long, n_tokens long"
    )
    out = {
        r.doc_id: (r.start_offset, r.seq_id, r.seq_offset)
        for r in pack_sequences(t, "doc_id", "n_tokens", seq_len=10, n_buckets=4).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r.doc_id: (r.start, r.start // 10, r.start % 10)
        for r in t.select(
            "doc_id", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start")
        ).collect()
    }
    assert out == naive
    # sequences are dense: first doc starts at 0, offsets strictly increase
    assert out[1][0] == 0


def test_pack_sequences_single_bucket_degenerates_gracefully(spark):
    t = spark.createDataFrame([(1, 5), (2, 7), (3, 9)], "doc_id long, n_tokens long")
    out = {r.doc_id: r.start_offset for r in pack_sequences(t, n_buckets=1).collect()}
    assert out == {1: 0, 2: 5, 3: 12}
