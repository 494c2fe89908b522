"""Event-time windowed aggregation with late-data watermarks.

The reference has no stream processing (SURVEY.md §2-D) — its streaming
analog is the incremental crawler (incremental.py). This module adds the
Structured-Streaming-native operator a large-scale ingest pipeline pairs
with the index: tumbling event-time windows over an append-only event
stream, tolerant of late data up to a watermark.

One function serves BOTH batch and streaming frames: `withWatermark` is a
no-op on batch DataFrames, so the identical plan runs as a batch job (the
DuckDB-oracle-checkable form, `windowed_event_counts` in
extra_queries()) or as a `readStream` micro-batch query — Spark's
batch/streaming unification doing the work, no custom operator needed.
Tested in tests/test_streaming_multimodal.py: the streaming (availableNow)
result must equal the batch result on the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count + sum per key. Streaming-safe: state for a
    window is dropped once the watermark passes its end, bounding memory
    at any scale; on a batch frame the watermark is a no-op and the plan
    is a plain two-phase (partial+final) hash aggregate."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n",
            "total",
        )
    )


def windowed_event_counts_sql(window_len_hours: int = 1) -> str:
    """DuckDB twin (batch form): tumbling window = date_trunc bucket."""
    assert window_len_hours == 1, "oracle written for 1-hour windows"
    return """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*)::BIGINT AS n, round(sum(value), 2) AS total
FROM events
GROUP BY 1, 2
"""
