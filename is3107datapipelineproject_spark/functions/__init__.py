"""Scalar expression library (SURVEY §2.7 F1–F14)."""

from is3107datapipelineproject_spark.functions import scalar

__all__ = ["scalar"]
