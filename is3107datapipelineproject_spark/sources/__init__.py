"""Sources: table catalog, CSV scans, DBLP XML flattener, staging fetch."""

from is3107datapipelineproject_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
