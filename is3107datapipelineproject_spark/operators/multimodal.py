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
  md5) through the exact same plumbing, and ``resize_images`` /
  ``sample_frames`` run deterministic fake kernels (blob slicing) the
  oracle can reproduce; swapping in a real decoder changes only the
  inner function, not the plan.

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


FRAME_BYTES = 64  # deterministic-fake frame size: 1 "frame" = 64 payload bytes
FRAME_EVERY_N = 4  # keep every 4th frame
RESIZE_STRIDE = 4  # keep every 4th byte ("thumbnail")

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_resized", T.LongType()),
        T.StructField("resample_md5", T.StringType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_kept", T.IntegerType()),
        T.StructField("sample_md5", T.StringType()),
    ]
)


def resize_images(df: DataFrame, stride: int = 4) -> DataFrame:
    """DETERMINISTIC FAKE resize: keep every ``stride``-th payload byte
    (a byte-domain "thumbnail"). A real pipeline replaces the kernel body
    with PIL decode → resize → re-encode; the Spark plan (narrow
    mapInPandas over Arrow batches of binary), output schema, and
    partitioning are exactly what the real kernel uses.

    Output: ``(doc_id, n_bytes, n_resized, resample_md5)`` where the md5
    is over the uppercase hex of the resampled bytes (cross-engine
    comparable without binary-literal plumbing)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(bytes)
            resized = payloads.map(lambda b: b[::stride])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "n_resized": resized.map(len).astype("int64"),
                    "resample_md5": resized.map(
                        lambda b: hashlib.md5(b.hex().upper().encode()).hexdigest()
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 4) -> DataFrame:
    """DETERMINISTIC FAKE video-frame sampling: the payload is treated as
    a sequence of ``FRAME_BYTES``-byte frames; keep every ``every_n``-th
    frame (ffmpeg keyframe extraction swaps in for the chunker at
    production time — same plan and schema).

    Output: ``(doc_id, n_frames, n_kept, sample_md5)`` with the md5 over
    uppercase hex of the concatenated kept frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                frames = [b[j : j + FRAME_BYTES] for j in range(0, len(b), FRAME_BYTES)]
                kept = b"".join(frames[::every_n])
                rows.append(
                    (
                        doc_id,
                        len(frames),
                        len(frames[::every_n]),
                        hashlib.md5(kept.hex().upper().encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_frames", "n_kept", "sample_md5"])

    return df.select("doc_id", "payload").mapInPandas(kernel, FRAMES_SCHEMA)
