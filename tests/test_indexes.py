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


def test_bucketed_fact_join_plan(spark):
    """The co-bucketed orders⋈lineitem contract: with broadcast off
    (simulating the 100 TB case where neither fact fits an executor),
    the equi-join must plan as a SortMergeJoin whose subtree contains
    NO Exchange — both bucketed scans already report the required
    HashPartitioning(orderkey, 16). The only exchange in the whole plan
    is the 5-row priority rollup. At toy SF with broadcast enabled
    Catalyst correctly prefers a broadcast join instead; that adaptive
    downgrade is allowed, the shuffle is not."""
    fn = registry.queries()["bucketed_join_revenue"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, plan[:400]
    join_subtree = plan[plan.index("SortMergeJoin"):]
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Bucketed: true" in join_subtree
    assert join_subtree.count("Exchange") == 0, (
        "bucketed fact join must not shuffle either side:\n" + join_subtree[:600]
    )


def test_zorder_layout_prunes_boxes(spark, tmp_path):
    """The reason the z-table exists: for a box predicate (quarter of
    the user range × quarter of the time range) the Morton layout must
    leave FEWER row groups with overlapping min/max stats than a plain
    time-sorted layout of the same rows — time-sorting gives tight ts
    stats but full-range user stats, so every time-overlapping group
    survives the user dimension; the z-curve clusters both at once.
    Stats are read straight from the parquet footers (what the scan's
    row-group skipping consults)."""
    import glob

    import pyarrow.parquet as pq

    from is3107datapipelineproject_spark.plans.indexes import (
        _tag,
        zorder_events_table,
    )

    sf = "/root/testdata/sf0.01"
    zorder_events_table(spark, sf)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    zdir = f"{wh}/events_z_{_tag(sf).lower()}"
    e = spark.read.parquet(f"{sf}/events.parquet")
    tdir = str(tmp_path / "events_tsorted")
    old_tt = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        e.repartitionByRange(32, "ts").sortWithinPartitions("ts").write.parquet(tdir)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", old_tt)

    import datetime

    from pyspark.sql import functions as F

    u0, u1, d0, d1 = e.agg(
        F.min("user_id"), F.max("user_id"),
        F.min(F.unix_date(F.to_date("ts"))), F.max(F.unix_date(F.to_date("ts"))),
    ).first()
    uhi = u0 + (u1 - u0) // 4
    epoch = datetime.datetime(1970, 1, 1)
    lo_ts = epoch + datetime.timedelta(days=int(d0))
    hi_ts = epoch + datetime.timedelta(days=int(d0 + (d1 - d0) // 4) + 1)

    def overlapping_groups(d: str) -> tuple[int, int]:
        tot = hit = 0
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                cols = {
                    md.row_group(rg).column(i).path_in_schema:
                        md.row_group(rg).column(i).statistics
                    for i in range(md.row_group(rg).num_columns)
                }
                tot += 1
                su, st = cols["user_id"], cols["ts"]
                # Spark writes isAdjustedToUTC → pyarrow returns aware
                # datetimes; the box bounds are naive wall-clock values.
                st_min = st.min.replace(tzinfo=None)
                st_max = st.max.replace(tzinfo=None)
                if (su.min <= uhi and su.max >= u0
                        and st_min < hi_ts and st_max >= lo_ts):
                    hit += 1
        return hit, tot

    z_hit, z_tot = overlapping_groups(zdir)
    t_hit, t_tot = overlapping_groups(tdir)
    assert z_tot >= 16 and t_tot >= 16
    assert z_hit < t_hit, (
        f"z-order must beat time-sort on a 2-D box: z {z_hit}/{z_tot} vs ts {t_hit}/{t_tot}"
    )
    assert z_hit <= z_tot // 4, (
        f"box covers 1/16 of the plane; z-layout should skip most groups: {z_hit}/{z_tot}"
    )


def test_dpp_plan_prunes_partitions(spark):
    """dpp_modern_era_revenue's fact scan must carry a runtime
    ``dynamicpruning`` PartitionFilter derived from the era-dim join —
    the query names no year, yet only matching year directories are
    read."""
    fn = registry.queries()["dpp_modern_era_revenue"]
    plan = _plan(fn(spark, SF))
    m = re.search(r"orders_byyear[^\n]*", plan)
    assert m, "year-partitioned orders scan missing"
    assert "dynamicpruning" in m.group(0), (
        "fact scan must be dynamically pruned: " + m.group(0)[:300]
    )


def test_runtime_bloom_filter_join(spark):
    """bloom_join_brand_qty's 100 TB contract: with the application-side
    size threshold lowered to simulate a big fact scan (and broadcast
    off so the join actually shuffles), Spark must inject a
    bloom_filter_agg over the filtered dim keys and a ``might_contain``
    predicate into the fact side — runtime row-level pruning, the
    sibling of DPP's partition-level pruning."""
    fn = registry.queries()["bloom_join_brand_qty"]
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        plan = _plan(fn(spark, SF))
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert "might_contain" in plan, "fact side must carry the runtime bloom probe"
    assert "bloom_filter_agg" in plan, "dim side must build the bloom filter"
