"""Stream-stream joins: correlate two unbounded streams within a time
bound. State contract: both sides buffer rows in the state store; the
watermark + the time-range join condition bound how long a row can
wait for a match, so state is reclaimed as event time advances —
without the interval bound the buffers grow forever (Spark rejects
unbounded stream-stream inner joins without watermark + time
constraint for exactly that reason at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    within_seconds: int = 900,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join click events to the purchases the same user makes within
    `within_seconds` AFTER the click — the classic attribution join.

    Both sides are watermarked; the join condition carries the
    time-range predicate (purchase_ts in [click_ts, click_ts+T]) that
    lets the engine expire buffered state: a click older than
    watermark - T can never match a future purchase and is evicted.
    """
    clicks = (
        left.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        right.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {within_seconds} SECONDS")
        ),
    ).select("c_user", "click_id", "click_ts", "purchase_id", "purchase_ts", "amount")


def stream_stream_interval_outer_join(
    left: DataFrame,
    right: DataFrame,
    within_seconds: int = 900,
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER attribution join: every click emits — joined to the
    purchases the same user makes within `within_seconds`, or with
    null purchase columns once the watermark proves no match can
    arrive (batch twin: queries/events_windows.join_interval_outer).

    The outer side is what makes the watermark+interval contract
    load-bearing rather than advisory: the engine can only emit the
    null row for an unmatched click when event time has advanced past
    click_ts + within_seconds, so the null-row latency IS the state
    bound. Same state-store footprint as the inner join.

    Operational nuance (verified in tests/test_streaming.py): the
    query's watermark is the MIN across the two watermarked inputs,
    each tracking its OWN time column — a stalled purchase stream
    therefore stalls null-row emission for clicks too (the
    multipleWatermarkPolicy trade; 'max' trades that latency for
    risking drops on the slow side)."""
    clicks = (
        left.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        right.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {within_seconds} SECONDS")
        ),
        "leftOuter",
    ).select(
        "c_user", "click_id", "click_ts", "purchase_id", "purchase_ts",
        "amount",
    )
