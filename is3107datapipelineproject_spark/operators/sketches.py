"""Count-min sketch as a DataFrame — the mergeable frequency sketch for
100-TB heavy-hitter tracking.

A CMS is a d × w counter matrix: item x adds its weight to bucket
``h_j(x) % w`` in each of the d rows; the frequency estimate is the MIN
over the d buckets, which NEVER undercounts and overestimates by at most
~(e/w)·N with high probability. Represented here as a (row, bucket,
bucket_cnt) DataFrame:

- **building** is one partial-aggregatable shuffle (groupBy(row, bucket)
  sum) — at scale each executor combines map-side, exactly like any agg;
- **merging** sketches from different corpus slices (per-day, per-shard)
  is a union + the same re-aggregate — no raw re-scan, the property that
  makes the sketch the right shape for continuously-ingested corpora
  (asserted exactly in tests/test_sketches.py);
- **probing** joins the probe set's d (row, bucket) keys against the
  d×w-row sketch (broadcast — the sketch is a few thousand rows at any
  corpus size) and takes the min.

Hashes are md5-derived (cross-engine deterministic, same contract as
every content hash in this repo; see dedup.h28).

Reference parity: the reference has no sketch family at all (pandas
`main_dag.py` recomputes exact counts per run); this is part of the
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.dedup import h28

CMS_D = 4  # hash rows
CMS_W = 2048  # buckets per row


def cms_bucket(col: Column, row: int, w: int = CMS_W) -> Column:
    """Bucket of ``col`` in sketch row ``row``: md5-derived 28-bit hash
    of 'cms{row}|value', mod w. Oracle twin:
    ``CAST('0x' || substr(md5('cms{row}|' || x), 1, 7) AS BIGINT) % w``."""
    return h28(F.concat(F.lit(f"cms{row}|"), col)) % F.lit(w)


def cms_build(
    counts: DataFrame,
    item_col: str,
    weight_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Build the sketch table ``(row, bucket, bucket_cnt)`` from a
    pre-aggregated (item, weight) frame. Feeding per-item COUNTS instead
    of raw occurrences keeps the explode d× the vocabulary, not d× the
    corpus — the token groupBy that produces the counts is itself one
    partial-agg shuffle over the raw data."""
    keys = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                cms_bucket(F.col(item_col), j, w).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    return (
        counts.select(F.explode(keys).alias("rb"), F.col(weight_col).alias("__w"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("bucket_cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketch tables built with the same (d, w): union + re-sum.
    Counter addition commutes, so the merged sketch is BIT-IDENTICAL to
    one built over the concatenated input — no accuracy loss from
    slicing the corpus."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("bucket_cnt").alias("bucket_cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Estimate each probe item's frequency: min over the d rows of its
    bucket count (0 if a bucket is absent — possible only for items the
    sketch never saw). The sketch side is broadcast (d×w rows max)."""
    keys = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                cms_bucket(F.col(item_col), j, w).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    probed = probes.select(F.col(item_col), F.explode(keys).alias("rb")).select(
        item_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("bucket_cnt"), F.lit(0))).alias("cms_est"))
    )
