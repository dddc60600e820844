"""Streaming event-time operators: watermarked windows, session
windows, stateful dedup. These are the true streaming executions whose
batch twins live in queries/events_windows.py (same operators, bounded
input, DuckDB-oracle-checked there).

Late data contract: withWatermark(ts, delay) keeps per-window state
until watermark passes window.end + delay; later events drop. State
size is bounded by (#keys x #open windows) — the property that makes
these safe on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window counts (append-mode compatible)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), key_col)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sessionized_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Watermarked session windows (merging session state per key)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col, F.session_window(ts_col, gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful keyed dedup with bounded state:
    dropDuplicatesWithinWatermark expires seen-keys state once the
    watermark passes — the streaming form of dedup_exact."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
