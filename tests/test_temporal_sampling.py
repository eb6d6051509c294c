"""Edge-semantics tests for operators.temporal and operators.sampling
(tiny in-memory frames — the oracle-parity suite covers the bulk
behavior; these pin the corner cases an oracle diff would blur)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.sampling import (
    group_sample_topn,
    hash_split,
    stratified_sample,
)
from is3107datapipelineproject_spark.operators.temporal import (
    asof_join,
    interval_join,
    time_rollup,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_tie_and_missing(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:10:00")),   # exact tie with right ts
         (2, 10, _ts("2024-01-01 00:05:00")),   # before any right row
         (3, 11, _ts("2024-01-01 09:00:00"))],  # key with no right rows
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:10:00"), 7.5)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: (r["asof_ts"], r["v"])
        for r in asof_join(left, right, key="user_id", right_cols=("v",)).collect()
    }
    assert out[1] == (_ts("2024-01-01 00:10:00"), 7.5)  # ties match (>= semantics)
    assert out[2] == (None, None)                       # nothing preceding
    assert out[3] == (None, None)                       # key absent on right


def test_asof_rejects_output_name_collisions(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 1.0)], "user_id long, ts timestamp, v double"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 2.0)], "user_id long, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="collision.*'v'"):
        asof_join(left, right, key="user_id", right_cols=("v",))
    with pytest.raises(ValueError, match="collision.*'ts'"):
        asof_join(left, right, key="user_id", right_cols=("x",), ts_out="ts")


def test_interval_join_inclusive_bounds(spark):
    t0 = _ts("2024-01-01 00:00:00")
    left = spark.createDataFrame([(1, 5, t0)], "lid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 5, t0 + dt.timedelta(seconds=60)),    # exactly +tolerance
         (101, 5, t0 - dt.timedelta(seconds=60)),    # exactly -tolerance
         (102, 5, t0 + dt.timedelta(seconds=61)),    # just outside
         (103, 6, t0)],                              # wrong key
        "rid long, k long, ts timestamp",
    )
    got = sorted(
        r["rid"]
        for r in interval_join(left, right, key="k", tolerance_sec=60).collect()
    )
    assert got == [100, 101]


def test_time_rollup_levels(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 00:10:00"), 1.0),
         (_ts("2024-01-01 00:50:00"), 2.0),
         (_ts("2024-01-01 03:10:00"), 4.0),
         (_ts("2024-01-02 00:10:00"), 8.0)],
        "ts timestamp, value double",
    )
    rows = time_rollup(df).collect()
    # 3 (day,hour) + 2 (day) + 1 total
    assert len(rows) == 6
    total = [r for r in rows if r["g_day"] == 1 and r["g_hour"] == 1]
    assert len(total) == 1 and total[0]["cnt"] == 4 and total[0]["sum_value"] == 15.0
    day1 = [r for r in rows if r["g_day"] == 0 and r["g_hour"] == 1
            and r["day"] == _ts("2024-01-01 00:00:00")]
    assert day1[0]["cnt"] == 3 and day1[0]["sum_value"] == 7.0


def test_hash_split_exhaustive_and_stable(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000            # every row labeled exactly once
    assert counts["train"] > counts.get("val", 0)  # weights roughly respected
    # stability: same rows map to the same split under a different partitioning
    again = {r["doc_id"]: r["split"] for r in hash_split(df.repartition(7), "doc_id").collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert first == again


def test_temporal_plans_are_scale_safe(spark):
    """The reason these operators exist: a naive range-predicate join
    plans as a nested loop. Assert the physical plans Spark actually
    picked — as-of is window-only (no join operator), interval is an
    EQUI-join (never BroadcastNestedLoop/Cartesian)."""
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 00:00:00"))], "lid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(9, 5, _ts("2024-01-01 00:00:30"), 1.0)], "rid long, k long, ts timestamp, v double"
    )
    asof_plan = asof_join(
        left, right.select("k", "ts", "v"), key="k", right_cols=("v",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in asof_plan and "Window" in asof_plan

    iv_plan = interval_join(
        left, right, key="k", tolerance_sec=60
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in iv_plan and "Cartesian" not in iv_plan
    assert "HashJoin" in iv_plan or "SortMergeJoin" in iv_plan


def test_stratified_rates_and_group_topn(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)],
        "doc_id long, lang string",
    )
    kept = stratified_sample(df, "lang", {"en": 1.0}, id_col="doc_id", default_rate=0.0)
    langs = {r["lang"] for r in kept.select("lang").distinct().collect()}
    assert langs == {"en"}                         # rate-1 stratum fully kept, rate-0 dropped
    assert kept.count() == 1000

    topn = group_sample_topn(df, "lang", 5, id_col="doc_id")
    per = {r["lang"]: r["n"] for r in topn.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"en": 5, "fr": 5}


def test_shard_assignments_stable_in_range_balanced(spark):
    from is3107datapipelineproject_spark.operators.sampling import shard_assignments

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = shard_assignments(df, "doc_id", n_shards=8)
    counts = {
        r["shard_id"]: r["n"]
        for r in out.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == set(range(8))            # every shard id in [0, n) hit
    assert sum(counts.values()) == 2000            # total preserved (narrow op)
    assert max(counts.values()) < 2 * min(counts.values())  # md5 keys ~uniform
    # stability: assignment survives repartitioning (content hash, not partition RNG)
    first = {r["doc_id"]: r["shard_id"] for r in out.collect()}
    again = {
        r["doc_id"]: r["shard_id"]
        for r in shard_assignments(df.repartition(11), "doc_id", n_shards=8).collect()
    }
    assert first == again


def test_mixture_sample_semantics(spark):
    from is3107datapipelineproject_spark.operators.sampling import mixture_sample

    rows = [(i, "big") for i in range(400)] + [(i + 1000, "tiny") for i in range(5)] + [
        (i + 2000, "unlisted") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id LONG, src STRING")

    out = mixture_sample(df, "src", "id", {"big": 1.0, "tiny": 1.0}, n_target=40)
    got = {r.src: r.cnt for r in out.groupBy("src").agg(F.count("*").alias("cnt")).collect()}

    # unweighted strata are excluded entirely (not silently kept at rate 1)
    assert "unlisted" not in got
    # the tiny stratum saturates: quota 20 > 5 rows -> rate 1, all kept
    assert got.get("tiny") == 5
    # the big stratum samples at ~20/400: Bernoulli, so allow slack
    assert 5 <= got.get("big", 0) <= 40

    # membership is append-stable: growing OTHER strata never changes
    # which big-stratum rows are kept (same rate -> same hash filter)
    grown = df.union(
        spark.createDataFrame([(i + 5000, "unlisted") for i in range(100)], "id LONG, src STRING")
    )
    kept_before = {r.id for r in out.filter(F.col("src") == "big").collect()}
    out2 = mixture_sample(grown, "src", "id", {"big": 1.0, "tiny": 1.0}, n_target=40)
    kept_after = {r.id for r in out2.filter(F.col("src") == "big").collect()}
    assert kept_before == kept_after


def test_deterministic_shuffle_is_total_order_and_partition_independent(spark):
    from is3107datapipelineproject_spark.operators.sampling import deterministic_shuffle

    df = spark.range(1, 1001).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, "doc_id", n_buckets=16)
    pos = {r.doc_id: r.shuffle_pos for r in out.collect()}
    # exact permutation of 1..n
    assert sorted(pos.values()) == list(range(1, 1001))
    # physical partitioning must not change the order (content-hash only)
    pos2 = {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(df.repartition(7), "doc_id", n_buckets=16).collect()
    }
    assert pos == pos2
    # two-level rank must agree with the single-window reference order
    from is3107datapipelineproject_spark.operators.sampling import hash_unit
    ref = sorted(
        ((r["__f"], r.doc_id) for r in df.select("doc_id", hash_unit("doc_id", "shuffle").alias("__f")).collect())
    )
    want = {doc: i + 1 for i, (_, doc) in enumerate(ref)}
    assert pos == want


def test_priority_sample_weight_pull_and_determinism(spark):
    """DLT priorities: a row with overwhelming weight is always in the
    sample; output is exactly n; repartitioning never changes the set."""
    from is3107datapipelineproject_spark.operators.sampling import priority_sample

    rows = [(i, 10) for i in range(200)] + [(999, 10_000_000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = priority_sample(df, "id", "w", n=20).collect()
    assert len(got) == 20
    ids = {r["id"] for r in got}
    assert 999 in ids, "q = w/u: the heavy row's priority dominates any u"
    again = priority_sample(df.repartition(7), "id", "w", n=20).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    assert all(r["priority"] > 0 for r in got)


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def test_overlap_join_planted_cases(spark):
    """Boundary-inclusive overlap, long-interval single emission, and
    key isolation for overlap_join's cell decomposition."""
    from is3107datapipelineproject_spark.operators.temporal import overlap_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00")),
            # spans 26 hourly cells: must still pair exactly once
            (1, 11, _ts("2024-01-01 02:00:00"), _ts("2024-01-02 04:00:00")),
            (2, 20, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 09:00:00")),
        ],
        ["user_id", "lid", "start", "end"],
    )
    right = spark.createDataFrame(
        [
            # touches lid=10 exactly at its end instant -> inclusive pair
            (1, 100, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 01:30:00")),
            # inside the long interval, far from its start
            (1, 101, _ts("2024-01-02 03:00:00"), _ts("2024-01-02 03:10:00")),
            # same window as lid=20 but DIFFERENT key -> never pairs
            (3, 102, _ts("2024-01-01 00:30:00"), _ts("2024-01-01 01:00:00")),
            # no overlap with anything on key 1
            (1, 103, _ts("2024-01-03 00:00:00"), _ts("2024-01-03 01:00:00")),
        ],
        ["user_id", "rid", "start", "end"],
    )
    got = overlap_join(left, right, key="user_id", bucket_sec=3600)
    pairs = sorted((r["lid"], r["rid"], r["overlap_us"]) for r in got.collect())
    assert pairs == [
        (10, 100, 0),  # boundary touch: zero-length overlap, still a pair
        (11, 101, 600_000_000),
    ]
    # decomposition invariance: cell width must not change the pair set
    wide = overlap_join(left, right, key="user_id", bucket_sec=86_400)
    assert sorted((r["lid"], r["rid"]) for r in wide.collect()) == [p[:2] for p in pairs]
