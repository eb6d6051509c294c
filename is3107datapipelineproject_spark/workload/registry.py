"""Query registry: every operator from SURVEY.md §2 registers here as a
(name, spark-callable, DuckDB-oracle-SQL) triple.

The driver contract (``__spark_entry__.py``) runs each callable at
sf=0.01 and compares row-count + schema + order-insensitive value hash
against the oracle SQL executed by DuckDB on the same parquet files.
Column names AND types must therefore match exactly between the two —
alias every computed column on both sides, and pin integer widths with
explicit casts (Spark ``count()`` is BIGINT; DuckDB ``year()`` is BIGINT
where Spark's is INT, etc.).

Queries with no SQL-expressible twin (stateful streaming, approximate
sketches) register with ``oracle=None`` → the driver records a weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):  # decorator
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from is3107datapipelineproject_spark.workload import (  # noqa: F401
        curation_queries,
        domain_queries,
        llm_queries,
        star_queries,
        tpch_queries,
        window_queries,
    )

    _LOADED = True
