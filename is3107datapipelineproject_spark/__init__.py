"""is3107datapipelineproject_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark rebuild of the query and data-processing
capabilities of ``roberthobblebottom/is3107DataPipelineProject`` (an
Airflow + pandas + Cassandra ETL pipeline over the DBLP bibliography).
The blueprint is ``SURVEY.md`` at the repo root; every operator cites the
reference ``file:line`` it re-expresses.

Layout
------
- ``session``    — SparkSession builder with scale-aware defaults
- ``sources``    — table catalog, CSV scans, the DBLP XML flattener
- ``functions``  — scalar expression library (SURVEY §2.7 F1–F14)
- ``operators``  — relational ops, pair-counts, incremental merge,
                   dedup (exact/MinHash/SimHash + clustering), similarity,
                   text stats, multimodal plumbing, temporal joins
                   (as-of / interval / rollup), deterministic sampling
- ``plans``      — physical layout helpers (partitioning, sorting)
- ``streaming``  — Structured Streaming windows + CDC merge
- ``workload``   — the registered query workload (queries + DuckDB oracles)
"""

from is3107datapipelineproject_spark.session import get_spark

__all__ = ["get_spark"]
