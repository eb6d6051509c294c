"""Planted-structure tests for the power-iteration spectral operator
(operators/spectral.py)."""

from __future__ import annotations

import math

from pyspark.sql import types as T

from is3107datapipelineproject_spark.operators.spectral import (
    pc_projection,
    top_principal_component,
)

_SCHEMA = T.StructType(
    [
        T.StructField("vid", T.LongType()),
        T.StructField("vec", T.ArrayType(T.FloatType())),
    ]
)


def _planted(spark):
    """Zero-mean corpus whose dominant variance direction is axis 0 by a
    wide margin: +-10 on dim0, +-1 on dim1, 0 on dim2."""
    rows = []
    for i in range(8):
        rows.append((2 * i, [10.0 + 0.1 * i, 1.0, 0.0]))
        rows.append((2 * i + 1, [-10.0 - 0.1 * i, -1.0, 0.0]))
    return spark.createDataFrame(rows, _SCHEMA)


def test_top_pc_recovers_dominant_axis(spark):
    out = {r.dim: r.loading for r in top_principal_component(_planted(spark), "vid", "vec").collect()}
    assert set(out) == {0, 1, 2}
    # unit norm, dominated by dim 0, sign pinned by the smallest-id init
    # (vid 0 has +10 on dim0, so the direction points positive)
    assert abs(math.sqrt(sum(v * v for v in out.values())) - 1.0) < 1e-4
    assert out[0] > 0.99
    assert abs(out[1]) < 0.15
    assert abs(out[2]) < 1e-6


def test_top_pc_deterministic_across_repartitioning(spark):
    df = _planted(spark)
    a = sorted((r.dim, r.loading) for r in top_principal_component(df, "vid", "vec").collect())
    b = sorted(
        (r.dim, r.loading)
        for r in top_principal_component(df.repartition(7), "vid", "vec").collect()
    )
    assert a == b


def test_projection_orders_by_dominant_coordinate(spark):
    df = _planted(spark)
    proj = {r.vid: r.proj for r in pc_projection(df, "vid", "vec").collect()}
    assert len(proj) == 16
    # projections onto the +dim0 direction: positive for even vids (dim0
    # positive), negative for odd, magnitude ~10
    for vid, p in proj.items():
        assert (p > 9.0) if vid % 2 == 0 else (p < -9.0)
