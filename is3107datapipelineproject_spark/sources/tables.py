"""Parquet table catalog over the driver-provided star schema.

Mirrors the reference's "one query-first table per access pattern"
(Cassandra, docx §CQL DDL — see SURVEY.md §1.3) with partition-prunable
parquet scans. At cluster scale each of these would be a partitioned /
bucketed table; at test scale they are single parquet files under
``/root/testdata/sf*/``.

The ``events`` table's on-disk timestamp layout has varied across driver
testdata generations — INT64 TIMESTAMP(NANOS) (needs the ``nanosAsLong``
conf, reads as ``bigint``), TIMESTAMP(MICROS, isAdjustedToUTC=false)
(reads as ``timestamp_ntz``), and plain UTC TIMESTAMP. ``load_table``
normalizes all three to the same contract: a proper UTC ``timestamp``
column ``ts`` plus a nanosecond-epoch long ``ts_ns``, so downstream
windowing can pick either representation. Truncation (not rounding) on
the nanos path matches DuckDB's ns→us cast; the NTZ→UTC cast is exact
because the session timezone is pinned to UTC (session.py), which is
also how DuckDB reads the same naive column — oracle parity holds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize an events frame to (``ts`` UTC timestamp, ``ts_ns``
    nanosecond-epoch long) regardless of the on-disk layout it was read
    with. Works identically on batch and streaming frames — the streaming
    source (streaming.windows.events_stream) routes through this too, so
    stream/batch twins agree exactly.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # INT64 TIMESTAMP(NANOS) read via the nanosAsLong legacy conf.
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts_ns DIV 1000 AS LONG))")
        )
    else:
        if dt == "timestamp_ntz":
            # Naive micros; session tz is UTC so this cast is the identity
            # on the wall-clock value (same reading DuckDB gives it).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        df = df.withColumn("ts_ns", F.unix_micros("ts") * F.lit(1000))
    return df.select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table. Column pruning / predicate pushdown are left
    to Catalyst — callers express filters declaratively on the result."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            # A driver may pin confs as static; degrade like
            # session.apply_runtime_confs and let the read proceed.
            pass
        return normalize_events(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
