"""Build-once surfaces (plans/indexes.py): physical-plan contracts.

Correctness of the from-index queries is oracle-checked like every
other registry entry (test_oracle_parity / the driver); these tests pin
the SCALE claims — the reasons the materialized tables exist at all:

- the edge-table scan is bucketed, and the PageRank loop over it never
  broadcasts or sort-merges the edge side (the round-6 probe caught
  Catalyst flipping to an edges-build BroadcastHashJoin once the table
  was small on disk — OOM at sf0.1 on a default-heap driver),
- the codes scan of the persisted IVF-PQ index carries a literal
  cluster PartitionFilter (planning-time pruning to ~1/k_coarse of the
  files),
- rebuilds are idempotent across sessions-with-stale-warehouse-dirs
  (the LOCATION_ALREADY_EXISTS trap).
"""

from __future__ import annotations

import re

from is3107datapipelineproject_spark.workload import registry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pagerank_from_edges_plan(spark):
    fn = registry.queries()["pagerank_from_edges"]
    plan = _plan(fn(spark, SF))
    assert "Bucketed: true" in plan, "edge scan must use the bucketed layout"
    assert "BroadcastHashJoin" not in plan, "edge side must never broadcast"
    assert "SortMergeJoin" not in plan, "edge side must never per-iteration sort"
    assert plan.count("ShuffledHashJoin") == 3, "one SHJ per iteration, rank as build side"


def test_ivfpq_codes_scan_partition_prunes(spark):
    fn = registry.queries()["ivfpq_topk_from_index"]
    plan = _plan(fn(spark, SF))
    m = re.search(r"_codes\[[^\]]*\][^\n]*", plan)
    assert m, "codes table scan missing from plan"
    scan_line = m.group(0)
    assert re.search(r"PartitionFilters: \[[^\]]*cluster", scan_line), (
        "codes scan must prune on a literal cluster id: " + scan_line[:200]
    )


def test_edge_table_rebuild_survives_stale_location(spark):
    from is3107datapipelineproject_spark.plans.indexes import (
        _tag,
        copurchase_edge_table,
    )

    table = f"copurchase_edges_{_tag(SF)}"
    copurchase_edge_table(spark, SF)
    n1 = spark.table(table).count()
    # simulate a NEW session: catalog forgets, warehouse dir survives
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert not os.path.exists(os.path.join(wh, table.lower())), (
        "DROP TABLE removes the managed location; recreate the stale-dir case"
    )
    os.makedirs(os.path.join(wh, table.lower()), exist_ok=True)
    n2 = copurchase_edge_table(spark, SF).count()
    assert n1 == n2 and n1 > 0
