"""Structured Streaming: watermarked event-time windows + per-batch CDC
merge (SURVEY §2.8 ST1-ST4)."""

from is3107datapipelineproject_spark.streaming.windows import (
    events_stream,
    foreach_batch_merge,
    normalize_event_time,
    sliding_counts,
    stateful_user_totals,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "foreach_batch_merge",
    "normalize_event_time",
    "sliding_counts",
    "stateful_user_totals",
    "tumbling_counts",
]
