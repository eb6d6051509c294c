"""Run EVERY registered oracle-checkable query against DuckDB at sf0.01 —
a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from is3107datapipelineproject_spark.workload.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare_spark_duckdb

_ensure_loaded()
_ORACLE_CHECKED = [n for n, s in sorted(REGISTRY.items()) if s.oracle is not None]
_ROWS_ONLY = [n for n, s in sorted(REGISTRY.items()) if s.oracle is None]


@pytest.mark.parametrize("name", _ORACLE_CHECKED)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_ORACLE)
    n = compare_spark_duckdb(df, duck, spec.oracle, name=name)
    assert n >= 0


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
