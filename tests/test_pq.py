"""Unit tests for operators/pq.py — code-domain invariants and the
approximation contract the sf0.01 parity run can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators import pq as P
from tests.conftest import SF_ORACLE


def _emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def test_codes_cover_every_vector_and_stay_in_range(spark):
    emb = _emb(spark)
    n = emb.count()
    enc = P.pq_encode(emb, "vec_id", "embedding", m=8, k=16)
    stats = enc.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct("vec_id").alias("vecs"),
        F.min("code").alias("lo"),
        F.max("code").alias("hi"),
        F.count_distinct("sub").alias("subs"),
    ).first()
    assert stats["rows"] == n * 8
    assert stats["vecs"] == n
    assert stats["subs"] == 8
    assert 0 <= stats["lo"] and stats["hi"] <= 15


def test_codes_invariant_under_repartition(spark):
    emb = _emb(spark).limit(60)
    a = {tuple(r) for r in P.pq_encode(emb, "vec_id", "embedding").collect()}
    b = {
        tuple(r)
        for r in P.pq_encode(emb.repartition(7), "vec_id", "embedding").collect()
    }
    assert a == b


def test_seed_vectors_encode_to_their_own_code(spark):
    # the k smallest-id vectors ARE the codewords -> distance 0 to
    # themselves in every subspace -> code == their seed rank.
    emb = _emb(spark)
    seeds = [r["vec_id"] for r in emb.orderBy("vec_id").limit(16).collect()]
    enc = P.pq_encode(emb, "vec_id", "embedding", m=8, k=16).filter(
        F.col("vec_id").isin(seeds)
    )
    for r in enc.collect():
        assert r["code"] == seeds.index(r["vec_id"])


def test_adc_ranks_query_itself_first(spark):
    # the query (smallest id) is also seed 0: its ADC score equals the
    # table's max possible self-reconstruction -> it must rank first.
    emb = _emb(spark)
    top = P.pq_topk(emb, "vec_id", "embedding", m=8, k=16, topn=5).collect()
    qid = emb.agg(F.min("vec_id")).first()[0]
    assert top[0]["vec_id"] == qid
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_precomputed_codebook_roundtrip(spark):
    emb = _emb(spark).limit(100)
    cb = P.pq_codebook(emb, "vec_id", "embedding", m=8, k=4)
    via_cb = {tuple(r) for r in P.pq_encode(emb, "vec_id", "embedding", m=8, k=4, codebook=cb).collect()}
    direct = {tuple(r) for r in P.pq_encode(emb, "vec_id", "embedding", m=8, k=4).collect()}
    assert via_cb == direct
