"""binaryFile ingest + ORC roundtrip: the multimodal front door and the
second columnar interchange format."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.multimodal import decode_stub
from is3107datapipelineproject_spark.sources import binary_source as B
from tests.conftest import SF_SMOKE

_FILES = {
    "a.jpg": b"\xff\xd8\xff fake jpeg bytes",
    "b.png": b"\x89PNG fake png payload......",
    "c.wav": b"RIFF fake wav",
    "notes.txt": b"plain text payload",
    "blob.bin": b"\x00\x01\x02unknown",
}


def _mkfiles(tmp_path):
    for name, payload in _FILES.items():
        (tmp_path / name).write_bytes(payload)
    return str(tmp_path)


def test_scan_binary_dir_reads_whole_files(spark, tmp_path):
    d = _mkfiles(tmp_path)
    rows = {r["path"].split("/")[-1]: r for r in B.scan_binary_dir(spark, d).collect()}
    assert set(rows) == set(_FILES)
    for name, payload in _FILES.items():
        assert bytes(rows[name]["content"]) == payload
        assert rows[name]["length"] == len(payload)


def test_glob_prunes_at_listing(spark, tmp_path):
    d = _mkfiles(tmp_path)
    got = {r["path"].split("/")[-1] for r in B.scan_binary_dir(spark, d, glob="*.jpg").collect()}
    assert got == {"a.jpg"}


def test_binary_to_multimodal_feeds_decode_stub(spark, tmp_path):
    d = _mkfiles(tmp_path)
    mm = B.binary_to_multimodal(B.scan_binary_dir(spark, d))
    meta = {
        bytes(r["payload"]): (r["metadata"]["modality"], r["metadata"]["codec"])
        for r in mm.collect()
    }
    assert meta[_FILES["a.jpg"]] == ("image", "jpeg")
    assert meta[_FILES["c.wav"]] == ("audio", "pcm")
    assert meta[_FILES["blob.bin"]] == ("blob", "raw")
    # the exact mapInPandas plumbing real decoders will use
    decoded = {r["content_md5"]: r["n_bytes"] for r in decode_stub(mm).collect()}
    for payload in _FILES.values():
        assert decoded[hashlib.md5(payload).hexdigest()] == len(payload)


def test_content_derived_ids_stable_across_listing_order(spark, tmp_path):
    d = _mkfiles(tmp_path)
    a = {r["doc_id"] for r in B.binary_to_multimodal(B.scan_binary_dir(spark, d)).collect()}
    b = {
        r["doc_id"]
        for r in B.binary_to_multimodal(B.scan_binary_dir(spark, d).repartition(3)).collect()
    }
    assert a == b and len(a) == len(_FILES)


def test_pack_binary_corpus_roundtrip(spark, tmp_path):
    d = _mkfiles(tmp_path)
    mm = B.binary_to_multimodal(B.scan_binary_dir(spark, d))
    out = str(tmp_path / "packed")
    B.pack_binary_corpus(mm, out, shards=2)
    back = B.read_packed(spark, out)
    assert {bytes(r["payload"]) for r in back.collect()} == set(_FILES.values())
    assert back.schema["metadata"].dataType == mm.schema["metadata"].dataType


def test_orc_roundtrip_preserves_documents(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = str(tmp_path / "docs_orc")
    B.write_orc(docs, out)
    back = B.read_orc(spark, out)
    assert back.schema == docs.schema
    a = docs.agg(F.count(F.lit(1)), F.sum("n_chars")).first()
    b = back.agg(F.count(F.lit(1)), F.sum("n_chars")).first()
    assert tuple(a) == tuple(b)
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter(F.col("lang") == "en")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters")[1][:80]
