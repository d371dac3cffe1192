"""Streaming windowed aggregations with watermarks — the event-time
operators the reference lacks (SURVEY §2.7 notes none exist there) but any
Spark-first stream engine owes its users.

The batch twin of each aggregation lives in plans/window_queries.py
(hourly_event_counts) so the oracle certifies the aggregation expression;
these wrappers add the streaming concerns: watermarking for late data,
update/append modes, and windowed state cleanup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts_utc",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is set) event-time counts with a
    late-data watermark. State for windows older than the watermark is
    dropped — bounded state at any input scale.

    Works on both batch and streaming DataFrames (watermark is a no-op in
    batch), so the same plan is testable offline.
    """
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    ts_col: str = "ts_utc",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows: events separated by less than ``gap`` merge into one
    session per user. The streaming twin of plans/window_queries.sessionize
    (lag+cumsum); session_window handles merge/expiry in the state store."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
