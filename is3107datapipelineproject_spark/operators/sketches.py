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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
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


# --- Bloom filter (bit-set sibling of the CMS) -------------------------------

BLOOM_D = 4  # hash functions
BLOOM_M = 1 << 16  # bits


def bloom_bucket(col: Column, row: int, m: int = BLOOM_M) -> Column:
    """Bit index of ``col`` under hash ``row``: md5-derived, mod m.
    Oracle twin: ``CAST('0x' || substr(md5('bf{row}|' || x), 1, 7) AS
    BIGINT) % m``."""
    return h28(F.concat(F.lit(f"bf{row}|"), col)) % F.lit(m)


def bloom_build(items: DataFrame, item_col: str, d: int = BLOOM_D, m: int = BLOOM_M) -> DataFrame:
    """Build the filter as a ``(row, bit)`` DISTINCT set — the sparse
    representation of the bit array (dense bitmap packing is a storage
    concern; the set IS the filter's semantics, and stays join-able).
    Mergeable by union+distinct (bit OR), the same slice-and-merge
    shape as cms_build. Size is bounded by d×m rows but in practice
    ~d×|items| — broadcastable whenever the item set is (an eval
    benchmark, a blocklist, yesterday's new fingerprints)."""
    keys = F.array(
        *[
            F.struct(F.lit(j).alias("row"), bloom_bucket(F.col(item_col), j, m).alias("bit"))
            for j in range(d)
        ]
    )
    return (
        items.select(F.explode(keys).alias("rb"))
        .select(F.col("rb.row").alias("row"), F.col("rb.bit").alias("bit"))
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    item_col: str,
    d: int = BLOOM_D,
    m: int = BLOOM_M,
) -> DataFrame:
    """Membership test: an item is (maybe-)present iff ALL d of its bits
    are set — no false negatives ever; false positives at the classic
    (1-e^{-dn/m})^d rate. Adds ``bloom_hit`` (boolean).

    Plan: the FILTER side is broadcast (bounded by d×m rows ≈ a few MB
    at the defaults — the whole point vs shipping the reference set);
    probe values are deduplicated (one shuffle on the value, which the
    following groupBy reuses), tested against the broadcast bits, and
    the surviving hit set joins back by value — hit-set size is
    data-dependent, so that join is left to the planner (broadcast when
    small, shuffle join when not), never force-broadcast."""
    keys = F.array(
        *[
            F.struct(F.lit(j).alias("row"), bloom_bucket(F.col(item_col), j, m).alias("bit"))
            for j in range(d)
        ]
    )
    # distinct first: duplicated probe values would otherwise contribute
    # d bits EACH and break the all-d-bits-set count below
    probed = (
        probes.select(item_col).distinct()
        .select(F.col(item_col), F.explode(keys).alias("rb"))
        .select(item_col, F.col("rb.row").alias("row"), F.col("rb.bit").alias("bit"))
    )
    hits = (
        probed.join(F.broadcast(bloom), ["row", "bit"], "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("__set_bits"))
        .filter(F.col("__set_bits") == d)
        .select(item_col, F.lit(True).alias("bloom_hit"))
    )
    return probes.join(hits, item_col, "left").fillna({"bloom_hit": False})


# --- Mergeable quantile sketch (fixed-boundary histogram) --------------------
#
# The fourth classic mergeable summary next to CMS / Bloom / HLL: a
# histogram over FIXED bin boundaries is trivially mergeable (union +
# re-sum — bin identity never depends on the data seen), and a quantile
# read off the merged histogram is within one bin width of truth. Fixed
# boundaries trade the adaptivity of t-digest/KLL for determinism: the
# estimate is a pure function of the data, so shard-built-then-merged
# equals global-built bit-for-bit and a SQL oracle can replay it.

HIST_WIDTH = 100.0


def hist_build(df: DataFrame, value_col: str, width: float = HIST_WIDTH) -> DataFrame:
    """Build the ``(bin, bin_cnt)`` histogram: bin = floor(value/width).
    One partial-agg shuffle whose output is bounded by the VALUE RANGE
    (range/width rows), not the input size."""
    b = F.floor(F.col(value_col) / F.lit(float(width))).cast("long")
    return df.filter(F.col(value_col).isNotNull()).groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("bin_cnt")
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Merge histograms built with the same width: union + re-sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("bin_cnt").cast("long").alias("bin_cnt"))


def hist_quantiles(sketch: DataFrame, quantiles: Sequence[float], width: float = HIST_WIDTH) -> DataFrame:
    """Quantile upper bounds from the histogram: for rank r = ceil(q·N),
    the upper edge of the first bin whose cumulative count reaches r —
    a conservative estimate with error ≤ width.

    The cumulative window is over the SKETCH (≤ range/width rows), never
    the data, so the single-partition window is bounded at any input
    scale; N attaches as a broadcast 1-row scalar and the quantile list
    as a broadcast literal frame (non-equi ≥ join over ~bins×|q| rows).
    """
    cum = sketch.withColumn(
        "cum",
        F.sum("bin_cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    total = sketch.agg(F.sum("bin_cnt").cast("long").alias("n"))
    qdf = sketch.sparkSession.createDataFrame([(float(q),) for q in quantiles], "q double")
    hits = cum.crossJoin(F.broadcast(total)).join(
        F.broadcast(qdf),
        F.col("cum") >= F.ceil(F.col("q") * F.col("n")).cast("long"),
    )
    return hits.groupBy("q").agg(
        ((F.min("bin") + F.lit(1)) * F.lit(float(width))).cast("double").alias("est_upper")
    )


# --- KMV (k-minimum-values) distinct sketches -------------------------------

KMV_K = 256


def kmv_sketches(df: DataFrame, key_col: str, item_col: str, k: int = KMV_K) -> DataFrame:
    """Per-key KMV distinct sketch: the ``k`` smallest h28 hashes of the
    key's DISTINCT items, as one sorted array row per key —
    constant-size (k·8 bytes) mergeable state per key no matter how
    many items feed it, the theta-sketch contract for set-cardinality
    algebra (union/intersection across keys) that exact distinct
    counting can't give a streaming or cross-release pipeline.

    Plan: distinct (key, hash) → per-key top-k via a key-PARTITIONED
    rank window (WindowGroupLimit prunes to k per partition BEFORE the
    shuffle materializes) → collect_sort. The 28-bit hash space matches
    the corpus regime (collisions shift the estimate by ~n/2^28 —
    negligible below tens of millions of distinct items per key; widen
    to h60 beyond that)."""
    from pyspark.sql import Window

    from is3107datapipelineproject_spark.operators.dedup import h28

    d = df.select(F.col(key_col).alias("key"), h28(F.col(item_col)).alias("h")).distinct()
    w = Window.partitionBy("key").orderBy("h")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("key")
        .agg(F.array_sort(F.collect_list("h")).alias("sketch"))
    )


def kmv_pair_estimates(sketches: DataFrame, k: int = KMV_K) -> DataFrame:
    """Pairwise Jaccard/union estimates from per-key KMV sketches
    (Beyer et al., 2007): for each key pair, threshold = the k-th
    smallest of the MERGED hash multiset; Jaccard-hat = |values below
    the threshold present in BOTH sketches| / k; union-hat =
    (k−1)·2^28/threshold. When the merged sketch is UNDER-FILLED
    (union < k) the sketches hold the entire union, so the exact count
    ``|merged|`` is returned instead of the threshold estimator (which
    is biased low in that regime — KMV gives exactness for free there).
    Everything up to the two final divisions is integer array algebra
    over k-sized broadcastable rows — #keys² pair rows of constant-size
    work, zero corpus access."""
    a = sketches.select(
        F.col("key").alias("key1"), F.col("sketch").alias("s1")
    )
    b = sketches.select(
        F.col("key").alias("key2"), F.col("sketch").alias("s2")
    )
    pairs = a.join(b, F.col("key1") < F.col("key2"))
    merged = F.slice(F.array_sort(F.array_union("s1", "s2")), 1, k)
    kth = F.element_at(merged, -1)
    both = F.size(F.array_intersect(F.array_intersect(merged, "s1"), "s2"))
    n_used = F.least(F.lit(k), F.size(merged))
    return pairs.select(
        "key1",
        "key2",
        n_used.cast("int").alias("k_used"),
        F.round(both.cast("double") / n_used.cast("double"), 4).alias("jaccard_est"),
        F.round(
            F.when(n_used < k, n_used.cast("double")).otherwise(
                (n_used.cast("double") - 1.0)
                * F.lit(float(1 << 28))
                / kth.cast("double")
            ),
            1,
        ).alias("union_est"),
    )
