"""Physical layout + write paths (partition pruning, clustering,
delete/upsert rewrites) — SURVEY S7-S10, O1/O2."""

from is3107datapipelineproject_spark.plans.layout import (
    connectivity_probe,
    delete_by_key,
    insert_only_upsert,
    read_partitioned,
    run_marker,
    write_csv_single,
    write_log_table,
    write_bucketed,
    write_partitioned,
)

__all__ = [
    "connectivity_probe",
    "delete_by_key",
    "insert_only_upsert",
    "read_partitioned",
    "run_marker",
    "write_csv_single",
    "write_log_table",
    "write_bucketed",
    "write_partitioned",
]
