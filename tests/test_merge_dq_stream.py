"""merge_apply CDC semantics + streaming DQ monitor stream==batch."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from is3107datapipelineproject_spark.operators.quality import row_checks
from is3107datapipelineproject_spark.plans.layout import merge_apply
from is3107datapipelineproject_spark.streaming.windows import (
    dq_monitor_sink,
    dq_monitor_totals,
    normalize_event_time,
)
from tests.conftest import SF_SMOKE


def test_merge_apply_update_insert_delete(spark):
    table = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "name", "v"]
    )
    changes = spark.createDataFrame(
        [
            ("U", 2, "b2", 99),   # update row 2
            ("D", 3, None, None), # delete row 3
            ("I", 4, "d", 40),    # insert row 4
        ],
        ["op", "k", "name", "v"],
    )
    got = sorted(tuple(r) for r in merge_apply(table, changes, "k").collect())
    assert got == [(1, "a", 10), (2, "b2", 99), (4, "d", 40)]


def test_merge_apply_rejects_duplicate_change_keys(spark):
    table = spark.createDataFrame([(1, 10)], ["k", "v"])
    changes = spark.createDataFrame([("U", 1, 11), ("D", 1, None)], ["op", "k", "v"])
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_apply(table, changes, "k")


def test_merge_apply_big_side_never_shuffles(spark):
    table = spark.createDataFrame([(i, i) for i in range(1000)], ["k", "v"])
    changes = spark.createDataFrame([("U", 5, 50)], ["op", "k", "v"])
    plan = (
        merge_apply(table, changes, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # anti-join must broadcast the tiny change-key side
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def _checks_factory():
    return {
        "value_nonneg": F.col("value") < 0,
        "type_known": ~F.col("event_type").isin(
            "view", "click", "purchase", "signup", "error"
        ),
        "user_complete": F.col("user_id").isNull(),
    }


def test_dq_monitor_stream_equals_batch(spark):
    # file streams track DIRECTORIES; stage the single-file testdata
    # into one (two files -> at least one multi-batch-capable listing)
    events_dir = tempfile.mkdtemp(prefix="dq_events_")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").repartition(2).write.mode(
        "overwrite"
    ).parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema
    report_dir = tempfile.mkdtemp(prefix="dq_report_")
    ckpt = tempfile.mkdtemp(prefix="dq_ckpt_")
    raw = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
        events_dir
    )
    src = normalize_event_time(raw)
    q = (
        src.writeStream.foreachBatch(dq_monitor_sink(report_dir, _checks_factory))
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r["check"]: (r["total"], r["violations"], r["passed"])
        for r in dq_monitor_totals(spark, report_dir).collect()
    }
    batch_df = normalize_event_time(spark.read.parquet(events_dir))
    batch = {
        r["check"]: (r["total"], r["violations"], r["passed"])
        for r in row_checks(batch_df, _checks_factory()).collect()
    }
    assert streamed == batch
    assert streamed["type_known"][2] is True  # sanity: domain check passes

    # at-least-once replay: writing the same batch id twice must count
    # it ONCE — the batch_id=<id> overwrite makes the log idempotent.
    replay_dir = tempfile.mkdtemp(prefix="dq_replay_")
    sink = dq_monitor_sink(replay_dir, _checks_factory)
    sink(batch_df, 0)
    sink(batch_df, 0)
    replayed = {
        r["check"]: (r["total"], r["violations"], r["passed"])
        for r in dq_monitor_totals(spark, replay_dir).collect()
    }
    assert replayed == batch
