"""Parquet table catalog over the driver-provided star schema.

Mirrors the reference's "one query-first table per access pattern"
(Cassandra, docx §CQL DDL — see SURVEY.md §1.3) with partition-prunable
parquet scans. At cluster scale each of these would be a partitioned /
bucketed table; at test scale they are single parquet files under
``/root/testdata/sf*/``.

The ``events`` table is written with INT64 TIMESTAMP(NANOS), which the
vectorized Spark parquet reader rejects by default; we flip the
``nanosAsLong`` runtime conf and materialize both the raw nanosecond
long (``ts_ns``) and a truncated-to-micros proper timestamp (``ts``) so
downstream windowing can pick either representation. Truncation (not
rounding) matches DuckDB's ns→us cast, keeping oracle parity.
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
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts", F.expr("timestamp_micros(CAST(ts_ns DIV 1000 AS LONG))"))
            )
        else:  # a session that read nanos natively (future Spark)
            df = df.withColumn("ts_ns", F.unix_micros("ts") * F.lit(1000))
        return df.select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
