"""Watermarked event-time windows over a stream (SURVEY §2.9).

Streaming twins of the registry's batch window queries (tumbling_window /
sliding_window / session_windows) — same expressions, readStream input,
plus watermarks for state eviction. On a bounded input with
``Trigger.AvailableNow`` these produce exactly the batch results, which
is how tests pin them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame, col: str = "ts") -> DataFrame:
    """Watermarks require TIMESTAMP (with local timezone); NTZ event
    times are cast at this boundary. Callers pin the session timezone to
    UTC (tables.table does) so the wall-clock values are unchanged."""
    if dict(events.dtypes).get(col) == "timestamp_ntz":
        events = events.withColumn(col, F.col(col).cast("timestamp"))
    return events


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )


def session_counts(
    events: DataFrame, gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )
