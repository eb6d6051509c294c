"""Unit tests for corpus-curation operators (operators.curation):
planted-case semantics and the boundary behaviors the sf-level oracle
parity can't isolate (budget edge, chunk boundaries, repartition
stability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.curation import (
    chunk_tokens,
    sample_to_token_budget,
    scrub_pii,
    unigram_surprisal,
)


def test_scrub_pii_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "write to alice.w@corp.io or bob_x@mail.net today"),
            (2, "call 555-0199 or 555-0200 now"),
            (3, "mixed a@b.co and 123-4567 together"),
            (4, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert (out[1].n_emails, out[1].n_phones) == (2, 0)
    assert (out[2].n_emails, out[2].n_phones) == (0, 2)
    assert (out[3].n_emails, out[3].n_phones) == (1, 1)
    assert (out[4].n_emails, out[4].n_phones) == (0, 0)
    assert out[1].text == "write to <EMAIL> or <EMAIL> today"
    assert out[3].text == "mixed <EMAIL> and <PHONE> together"
    assert out[4].text == "nothing sensitive here"


def test_token_budget_keeps_whole_docs_within_budget(spark):
    # One group, 5 docs of 10 tokens each, budget 35 → exactly 3 docs kept
    # (30 ≤ 35; the 4th would reach 40). Whole docs only, no truncation.
    docs = spark.createDataFrame(
        [(i, "g", 10) for i in range(5)], ["doc_id", "grp", "n_tokens"]
    )
    kept = sample_to_token_budget(
        docs, group_col="grp", token_count_col="n_tokens", budget=35, id_col="doc_id"
    ).collect()
    assert len(kept) == 3
    assert max(r.cum_tokens for r in kept) == 30

    # Exact-boundary row survives: budget 30 keeps the same 3 docs.
    exact = sample_to_token_budget(
        docs, group_col="grp", token_count_col="n_tokens", budget=30, id_col="doc_id"
    ).collect()
    assert sorted(r.doc_id for r in exact) == sorted(r.doc_id for r in kept)


def test_token_budget_stable_under_repartition(spark):
    docs = spark.createDataFrame(
        [(i, f"g{i % 3}", 5 + i % 7) for i in range(60)], ["doc_id", "grp", "n_tokens"]
    )
    a = sample_to_token_budget(docs, "grp", "n_tokens", 40, "doc_id")
    b = sample_to_token_budget(docs.repartition(13), "grp", "n_tokens", 40, "doc_id")
    assert sorted(r.doc_id for r in a.collect()) == sorted(r.doc_id for r in b.collect())


def test_unigram_surprisal_hand_computed(spark):
    # Corpus: 4 tokens total — 'a' ×3 (p=3/4), 'b' ×1 (p=1/4).
    # doc 1 = "a a a": surprisal = log2(4/3) ≈ 0.415; doc 2 = "b": 2 bits.
    df = spark.createDataFrame([(1, "a a a"), (2, "b")], ["doc_id", "text"])
    out = {r.doc_id: r for r in unigram_surprisal(df).collect()}
    assert out[1].n_tokens == 3 and out[2].n_tokens == 1
    assert abs(out[1].surprisal - 0.415) < 1e-3
    assert out[2].surprisal == 2.0


def test_chunk_tokens_boundaries(spark):
    def toks(n):
        return " ".join(f"t{i}" for i in range(n))

    df = spark.createDataFrame(
        [(1, toks(1)), (2, toks(32)), (3, toks(33)), (4, toks(80))],
        ["doc_id", "text"],
    )
    out = chunk_tokens(df, window=32, stride=24)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.chunk_id)

    # ≤ window tokens → exactly one chunk, full text.
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_chunk_tokens == 1
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 32
    # 33 tokens → 2 chunks; second starts at token 24 and holds the tail.
    assert [r.n_chunk_tokens for r in by_doc[3]] == [32, 9]
    assert by_doc[3][1].chunk_text.split(" ")[0] == "t24"
    # 80 tokens → chunks at 0/24/48: [32, 32, 32]; every token covered.
    assert [r.n_chunk_tokens for r in by_doc[4]] == [32, 32, 32]
    covered = set()
    for r in by_doc[4]:
        covered.update(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(80)}


def test_importance_resample_target_always_kept(spark):
    from is3107datapipelineproject_spark.operators.curation import importance_resample

    # 3 in-domain docs share a vocabulary; the off-domain doc is pure
    # out-of-target tokens, so its likelihood ratio (and keep weight) < 1.
    df = spark.createDataFrame(
        [(0, "alpha beta gamma", "en"), (1, "alpha beta beta", "en"),
         (2, "gamma alpha beta", "en"), (3, "zork quux zork quux zork", "fr")],
        "doc_id long, text string, lang string",
    )
    out = importance_resample(df, F.col("lang") == "en").collect()
    rows = {r["doc_id"]: r for r in out}
    # every target-domain doc has weight exactly 1.0 → always survives
    assert {0, 1, 2} <= set(rows)
    assert all(rows[i]["weight"] == 1.0 for i in (0, 1, 2))
    # the off-domain doc's weight is a genuine probability < 1
    if 3 in rows:
        assert rows[3]["weight"] < 1.0
    # deterministic: identical output under a different partitioning
    again = {r["doc_id"]: r["weight"]
             for r in importance_resample(df.repartition(5), F.col("lang") == "en").collect()}
    assert again == {k: v["weight"] for k, v in rows.items()}


def test_quantize_embeddings_range_and_reconstruction(spark):
    from is3107datapipelineproject_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.25]), (1, [0.1, 0.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    out = quantize_embeddings(df, "vec_id", "embedding").collect()
    assert len(out) == 6 and all(-127 <= r["q"] <= 127 for r in out)
    by = {(r["vec_id"], r["pos"]): r for r in out}
    # the global max |x| = 1.0 quantizes to the rail exactly
    assert by[(0, 1)]["q"] == 127 and by[(1, 3)]["q"] == -127
    # reconstruction error bounded by half a quantization step
    scale = 1.0 / 127
    originals = {(0, 1): 1.0, (0, 2): -0.5, (0, 3): 0.25, (1, 1): 0.1, (1, 2): 0.0, (1, 3): -1.0}
    for k, x in originals.items():
        assert abs(by[k]["q"] * scale - x) <= scale / 2 + 1e-9


def test_quality_classifier_orders_obvious_cases(spark):
    """Natural prose with stopwords must outscore punctuation soup, and
    the score must be invariant to partitioning (pure row expression)."""
    from is3107datapipelineproject_spark.operators.curation import quality_classifier

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs to the hills in a day"),
            (2, "!!! ??? ... ;;; ::: ((( ))) [[[ ]]] --- !!! ??? ... ;;;"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in quality_classifier(df, "text", "doc_id").collect()}
    assert out[1].quality_prob > out[2].quality_prob
    again = {
        r.doc_id: r for r in quality_classifier(df.repartition(5), "text", "doc_id").collect()
    }
    assert all(out[k].quality_prob == again[k].quality_prob for k in out)
