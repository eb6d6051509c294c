"""The registered query workload: Spark callables + DuckDB oracle twins."""

from is3107datapipelineproject_spark.workload.registry import REGISTRY, QuerySpec, register

__all__ = ["REGISTRY", "QuerySpec", "register"]
