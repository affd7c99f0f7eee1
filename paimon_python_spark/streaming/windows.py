"""Structured Streaming operators: watermarked event-time windows,
session windows, and stateful streaming dedup.

These take any streaming (or batch — the expressions are identical)
DataFrame with an event-time column. Watermarks bound state: at scale
the window aggregations hold only in-horizon partial aggregates per
(window, key) and late data beyond the watermark is dropped, which is
what makes unbounded streams tractable on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "5 minutes",
    watermark: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window count+sum per key — the canonical
    streaming aggregation (late rows beyond the watermark dropped)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum(value_col).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def session_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based) per key via the native session_window
    — state is one open session per key, merged as events arrive."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once dedup on a stream: dropDuplicatesWithinWatermark
    keeps one row per id within the watermark horizon — the streaming
    counterpart of the batch exact_dedup operator, with bounded state."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )
