"""Structured Streaming plane — the live half of the engine."""

from walrus_spark.streaming.stream import (  # noqa: F401
    consume_stream,
    high_watermark_progress,
    interval_join_stream,
    latest_per_key_stream,
    read_topic_stream,
    shared_cursor_stream,
    topic_stats_stream,
    windowed_counts,
    write_log_stream,
)
