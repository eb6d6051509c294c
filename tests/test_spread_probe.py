"""spread_small_input's under-partitioning probe: the file-metadata
estimate must spread a small file-backed scan, leave an adequately
partitioned frame alone, and fall back to the exact RDD probe for
frames that aren't file-backed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.dedup import spread_small_input


def test_small_file_scan_is_spread(spark, tmp_path):
    p = str(tmp_path / "small.parquet")
    spark.range(100).withColumn("t", F.lit("x")).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    target = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() < target
    out = spread_small_input(df)
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 100


def test_already_parallel_frame_untouched(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 2)
    out = spread_small_input(df)
    # not file-backed -> exact RDD probe; >= target partitions -> no-op
    assert out is df


def test_non_file_backed_small_frame_spread(spark):
    df = spark.range(10).coalesce(1)
    out = spread_small_input(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 10
