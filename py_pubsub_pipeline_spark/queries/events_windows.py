"""Event-time windows, batch twins of the streaming operators.

Each query here runs the exact operator Structured Streaming uses
(window / session_window work identically in batch mode), so the
DuckDB oracle validates the streaming semantics on bounded data; the
streaming execution itself (watermarks, triggers, state) is exercised
in streaming/ and its tests.

Scale notes: tumbling/sliding windows are plain hash aggs on a derived
key — map-side partial agg applies; session windows shuffle by user_id
then merge sorted runs per key (bounded state per user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import dsum, sql_dsum
from ..registry import query
from ..tables import table


@query(
    "stream_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (streaming twin:
    readStream + withWatermark + identical groupBy)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    oracle=f"""
    SELECT (epoch_us(ts) // 900000000) * 900000000
             - CAST(o.off AS BIGINT) * 900000000 AS window_start_us,
           COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
    FROM events
    CROSS JOIN (VALUES (0),(1),(2),(3)) o(off)
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour every 15 min): each event lands in 4
    windows. Output key is epoch-µs of the window start (integer math
    on both engines — cross-engine timestamp bucketing is exact)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(
            F.unix_micros(F.col("window.start").cast("timestamp")).alias(
                "window_start_us"
            ),
            "n",
            "sum_value",
        )
    )


@query(
    "stream_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
    FROM numbered GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via the native
    session_window operator (same operator streaming uses; the oracle
    is the classic gaps-and-islands rewrite). session_window.end =
    last event + gap, matching MAX(ts) + INTERVAL."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query("stream_dedup", oracle="SELECT DISTINCT event_id FROM events")
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed deduplication — batch twin of the streaming
    dropDuplicatesWithinWatermark operator."""
    return table(spark, sf_dir, "events").select("event_id").dropDuplicates()


@query(
    "join_interval_attrib",
    oracle="""
    SELECT c.user_id AS c_user, c.event_id AS click_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts, p.value AS amount
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 900 SECONDS
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def join_interval_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/joins.stream_stream_interval_join (the
    click->purchase attribution join): same code path run on a bounded
    DataFrame, oracle-checked here; the true streaming execution with
    watermark-bounded state is exercised in tests/test_streaming.py.
    Equi-key on user_id keeps it a hash join; the time bound is the
    join residual (and, when streaming, the state-eviction bound)."""
    from ..streaming.joins import stream_stream_interval_join

    ev = table(spark, sf_dir, "events")
    return stream_stream_interval_join(ev, ev, within_seconds=900)


@query(
    "stream_topk_windowed",
    oracle=f"""
    WITH agg AS (
      SELECT date_trunc('hour', ts) AS window_start, user_id,
             COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                   ORDER BY sum_value DESC, user_id) AS rnk
      FROM agg)
    SELECT window_start, user_id, n, sum_value, rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def stream_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by spend per tumbling hour — the leaderboard shape
    a streaming dashboard materializes per window close. Batch twin of
    the streaming plan (windowed agg -> per-window rank); in streaming
    this runs as the windowed aggregation with the rank applied in
    foreachBatch on closed windows (rank over open windows would need
    retraction). Two shuffles total: (window, user) agg, then the
    window-keyed rank whose input is already one row per (window,
    user) — aggregate-sized, not event-sized."""
    e = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    agg = (
        e.groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "user_id", "n", "sum_value",
        )
    )
    w = W.partitionBy("window_start").orderBy(
        F.col("sum_value").desc(), "user_id"
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "join_interval_outer",
    oracle="""
    SELECT c.user_id AS c_user, c.event_id AS click_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.value AS amount
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 900 SECONDS
    """,
)
def join_interval_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval join — attribution that also KEEPS the
    unconverted clicks (purchase columns null), the batch twin of a
    watermarked stream-stream outer join where the null row emits at
    watermark expiry. Same equi-key hash join as the inner form
    (user_id carries the shuffle; the time band is the join residual);
    the outer side adds no shuffle, only null-row emission."""
    ev = table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("amount"),
    )
    joined = c.join(
        p,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (
            F.col("p_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 900 SECONDS")
        ),
        "left",
    )
    return joined.select(
        "c_user", "click_id", "click_ts", "purchase_id", "amount"
    )
