"""Watermarked windowed aggregation — the late-data-tolerant streaming
count (task-brief streaming surface: "watermarks + windowed aggs for late
data"; the reference has none, SURVEY.md §2.9).

``windowed_event_counts`` = tumbling event-time windows over an event
stream with a watermark: a window is finalized (appended downstream) once
the watermark passes its end; events later than the watermark are dropped
by the engine. Pure built-ins — this is exactly the declarative form that
lets Spark manage window state and eviction at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str | None = "user_id",
) -> DataFrame:
    """Streaming (or batch — the expression is identical) tumbling-window
    counts: (window_start, window_end[, key], n_events)."""
    keys = [F.window(F.col(ts_col), window_duration).alias("w")]
    if key_col:
        keys.append(F.col(key_col))
    out = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(*keys)
        .agg(F.count("*").alias("n_events"))
    )
    cols = [
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
    ]
    if key_col:
        cols.append(F.col(key_col))
    return out.select(*cols, "n_events")
