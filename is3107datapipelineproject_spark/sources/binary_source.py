"""Binary-file ingest: the object-storage front door for multimodal data.

Beyond-reference surface (driver mandate): a 100-TB image/audio corpus
arrives as millions of raw files, not parquet. Spark's built-in
``binaryFile`` source reads them distributed — each task gets whole
files as ``(path, modificationTime, length, content: binary)`` rows with
the payload never touching the driver — and
:func:`binary_to_multimodal` normalizes that into the exact frame shape
``operators/multimodal.py`` processes (opaque payload + typed metadata),
so a directory of files and a parquet-packed corpus flow through the
same decode/resize/frame-sample plumbing.

Scale notes:
- ``pathGlobFilter`` prunes at LISTING time (files never opened);
  ``spark.sql.files.maxPartitionBytes`` governs how many small files
  pack into one task — at 100 TB, prefer fewer, larger archives or a
  parquet repack (``pack_binary_corpus``) over hot listings of tiny
  files.
- doc ids are content-derived (md5 of the payload, 60-bit prefix) —
  stable across re-listings, re-orderings, and replicated mounts; id
  collisions across distinct payloads are ~n²/2⁶⁰.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.multimodal import METADATA_SCHEMA

# extension → (modality, codec); unknown extensions become opaque blobs
_MODALITY = {
    "jpg": ("image", "jpeg"),
    "jpeg": ("image", "jpeg"),
    "png": ("image", "png"),
    "wav": ("audio", "pcm"),
    "mp3": ("audio", "mp3"),
    "mp4": ("video", "h264"),
    "txt": ("text", "utf-8"),
}


def scan_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Distributed whole-file scan: ``(path, length, content)``. The
    glob filter prunes at listing time — unmatched files are never
    opened."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select("path", "length", "content")


def binary_to_multimodal(df: DataFrame) -> DataFrame:
    """Normalize a binaryFile scan into the multimodal frame shape
    ``(doc_id, payload, metadata)`` that ``decode_stub`` /
    ``resize_images`` / ``sample_frames`` consume. Modality/codec come
    from the file extension (driver-free, per-row expression); width/
    height stay NULL until a real decoder fills them."""
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    modality = F.lit("blob")
    codec = F.lit("raw")
    for e, (m, c) in _MODALITY.items():
        modality = F.when(ext == e, F.lit(m)).otherwise(modality)
        codec = F.when(ext == e, F.lit(c)).otherwise(codec)
    return df.select(
        F.conv(F.substring(F.md5(F.col("content")), 1, 15), 16, 10)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            modality.alias("modality"),
            codec.alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).cast(METADATA_SCHEMA.simpleString()).alias("metadata"),
    )


def pack_binary_corpus(df: DataFrame, out_dir: str, shards: int = 0) -> None:
    """Repack a file-per-item corpus into parquet with the payload as a
    binary column — the listing-pressure fix for 100-TB small-file
    corpora: one repack turns N-million file opens per downstream scan
    into ordinary columnar reads with predicate pushdown on metadata."""
    w = df.repartition(shards) if shards > 0 else df
    w.write.mode("overwrite").parquet(out_dir)


def read_packed(spark: SparkSession, packed_dir: str) -> DataFrame:
    return spark.read.parquet(packed_dir)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — Spark's second built-in columnar format; interchange
    surface for Hive-side consumers. Same predicate-pushdown and
    column-pruning contract as parquet."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
