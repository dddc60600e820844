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


def windowed_leaderboard_stream(
    events: DataFrame,
    sink,  # Callable[[DataFrame, int], None] receiving ranked rows
    window: str = "1 hour",
    watermark: str = "10 minutes",
    k: int = 3,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
):
    """Per-window top-k leaderboard as a real stream (the streaming
    execution of queries/events_windows.stream_topk_windowed): the
    watermarked windowed aggregation runs INSIDE the engine with
    bounded state; the rank runs in foreachBatch over each emitted
    micro-batch of aggregate rows. Ranking inside the streaming plan
    would need retraction on every update — per-batch rank over the
    aggregate stream (update mode) gives the current standings per
    trigger, and the final emission for a window (after watermark
    close) is its settled leaderboard. Rank input is aggregate-sized
    (windows x keys this trigger), never event-sized.

    Returns the started StreamingQuery (caller stops/awaits)."""
    from pyspark.sql import Window as W

    agg = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), key_col)
        # decimal-exact sum: the ranking key must not depend on float
        # accumulation order (matches the batch twin's dsum contract)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            key_col,
            "n",
            "sum_value",
        )
    )

    def rank_and_sink(batch_df: DataFrame, epoch_id: int) -> None:
        w = W.partitionBy("window_start").orderBy(
            F.col("sum_value").desc(), key_col
        )
        sink(
            batch_df.withColumn("rnk", F.row_number().over(w)).filter(
                F.col("rnk") <= k
            ),
            epoch_id,
        )

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(rank_and_sink)
        .start()
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
