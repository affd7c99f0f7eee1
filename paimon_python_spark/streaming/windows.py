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


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: match right-side events that occur in
    ``[left_ts + lower, left_ts + upper]`` for the same key.

    Both sides are watermarked and the join condition is time-bounded
    in BOTH directions — that pair of constraints is what lets Spark
    evict state (each side holds only the in-horizon window of rows),
    so the join runs indefinitely on unbounded streams. Without the
    time bound the state would grow without limit; this is the
    canonical clicks-after-impressions shape.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} + interval {lower}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + interval {upper}"))
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key_col}").alias(key_col),
        F.col(f"l.{left_ts}").alias("left_ts"),
        F.col(f"r.{right_ts}").alias("right_ts"),
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
