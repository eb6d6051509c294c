"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Beyond-reference surface (driver mandate). Design for a 100 TB corpus of
images/audio/video:

- the payload is an opaque ``binary`` column next to a typed metadata
  struct (modality, codec, nominal dims) — never exploded, never parsed
  by Catalyst, columnar all the way to the Python worker;
- per-item decode/feature-extract runs as ``mapInPandas`` (Arrow batch
  transfer; tune ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
  batch of payloads fits worker memory);
- REAL decoders (PIL/ffmpeg/torchaudio) are not in this container, so
  ``decode_stub`` computes deterministic payload features (byte length +
  md5) through the exact same plumbing; swapping in a real decoder
  changes only the inner function, not the plan. ``resize_images`` /
  ``sample_frames`` raise NotImplementedError by design.

The stub path is oracle-checkable: byte length and md5 are engine-
independent facts about the payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build the multimodal frame shape from the documents table: the
    utf-8 bytes of ``text_col`` stand in for an image/audio payload, and
    a typed metadata struct rides alongside. At 100 TB the payload comes
    off object storage the same way — one binary column per row."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("fake/raw").alias("codec"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("int").alias("width"),
            F.lit(1).alias("height"),
        ).alias("meta"),
    )


def decode_stub(df: DataFrame) -> DataFrame:
    """Run the decode kernel over ``(doc_id, payload)`` with mapInPandas.
    Output: ``(doc_id, n_bytes, content_md5)``. Narrow — each partition's
    payloads stream through the Python worker in Arrow batches; no
    shuffle, no driver collection.

    The kernel is a LOCAL function on purpose: cloudpickle ships nested
    functions by value, so Python workers never need this package on
    their import path (the external driver may launch from any cwd).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Deterministic stub: real pipelines replace this body with
        # PIL/ffmpeg decode + feature extraction; batch shape, schema and
        # partitioning stay identical.
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode_batches, DECODED_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize requires an image library not present in this
    container. The Spark-side contract is identical to decode_stub:
    mapInPandas over (doc_id, payload) → (doc_id, payload) with resized
    bytes."""
    raise NotImplementedError(
        "image decode libraries are not available in this environment; "
        "wire a PIL-based kernel through the decode_stub plumbing"
    )


def sample_frames(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling — same situation as resize_images."""
    raise NotImplementedError(
        "video decode libraries are not available in this environment; "
        "wire an ffmpeg-based kernel through the decode_stub plumbing"
    )
