"""Structured Streaming: watermarked event-time windows, exactly-once
key dedup, stream-stream interval join, and per-batch CDC merge
(SURVEY §2.8 ST1-ST4)."""

from is3107datapipelineproject_spark.streaming.windows import (
    click_purchase_attribution,
    dedup_keys,
    events_stream,
    foreach_batch_merge,
    normalize_event_time,
    session_counts,
    sliding_counts,
    stateful_user_totals,
    tumbling_counts,
)

__all__ = [
    "click_purchase_attribution",
    "dedup_keys",
    "events_stream",
    "foreach_batch_merge",
    "normalize_event_time",
    "session_counts",
    "sliding_counts",
    "stateful_user_totals",
    "tumbling_counts",
]
