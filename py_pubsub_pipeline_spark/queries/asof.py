"""As-of join (nearest-prior match) — no native Spark primitive.

Implementation (SURVEY.md §2B join_asof): the union + last(ignorenulls)
window trick. Union the right side's timestamps into the left's
timeline per key, sort once per key, and carry the most recent right
row forward with last(..., ignorenulls=True). One shuffle on the key,
one per-partition sort — at 100 TB this beats a range-bucketed join
when every left row needs a match, and it never expands rows. (The
applyInPandas + pd.merge_asof variant would pay Arrow transfer on the
whole table; this stays in Tungsten.)

Oracle: DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           v.ts AS view_ts,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent view by the same user at or
    before the purchase (left as-of join on (user_id, ts))."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )

    # Merge both sides into one per-user timeline. side=0 (view) sorts
    # before side=1 (purchase) at equal timestamps, so a same-instant
    # view is visible to the purchase — DuckDB ASOF's >= semantics.
    left = purchases.select(
        "user_id",
        F.col("purchase_ts").alias("t"),
        F.lit(1).alias("side"),
        "event_id",
        "purchase_ts",
        F.lit(None).cast("timestamp_ntz").alias("view_ts"),
    )
    right = views.select(
        "user_id",
        F.col("view_ts").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("purchase_ts"),
        "view_ts",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "matched_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "purchase_ts",
        F.col("matched_view_ts").alias("view_ts"),
        (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("matched_view_ts").cast("timestamp"))
        ).alias("gap_us"),
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT v.event_id, v.user_id, v.ts AS view_ts,
           p.ts AS next_purchase_ts,
           epoch_us(p.ts) - epoch_us(v.ts) AS lead_us
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: for each view, the next purchase by the same
    user at or after it (time-to-conversion attribution). Same merged
    -timeline trick as join_asof with the frame reversed: first(...,
    ignorenulls) over currentRow..unboundedFollowing carries the
    nearest FUTURE purchase backward. At equal timestamps the
    purchase sorts after the view (side ordering), so a same-instant
    purchase is matched — DuckDB ASOF's <= semantics. Still one
    shuffle + one per-key sort, no row expansion."""
    e = table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.col("ts").alias("view_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    left = views.select(
        "user_id",
        F.col("view_ts").alias("t"),
        F.lit(0).alias("side"),
        "event_id",
        "view_ts",
        F.lit(None).cast("timestamp_ntz").alias("purchase_ts"),
    )
    right = purchases.select(
        "user_id",
        F.col("purchase_ts").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("view_ts"),
        "purchase_ts",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = left.unionByName(right).withColumn(
        "next_purchase_ts", F.first("purchase_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 0).select(
        "event_id",
        "user_id",
        "view_ts",
        "next_purchase_ts",
        (
            F.unix_micros(F.col("next_purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("view_ts").cast("timestamp"))
        ).alias("lead_us"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    b AS (SELECT p.event_id, p.user_id, p.ts, vb.ts AS prev_ts
          FROM p ASOF LEFT JOIN v vb
            ON p.user_id = vb.user_id AND p.ts >= vb.ts),
    f AS (SELECT p.event_id, vf.ts AS next_ts
          FROM p ASOF LEFT JOIN v vf
            ON p.user_id = vf.user_id AND p.ts <= vf.ts),
    c AS (
      SELECT b.event_id, b.user_id, b.ts,
             CASE
               WHEN prev_ts IS NULL THEN next_ts
               WHEN next_ts IS NULL THEN prev_ts
               WHEN epoch_us(b.ts) - epoch_us(prev_ts)
                    <= epoch_us(next_ts) - epoch_us(b.ts) THEN prev_ts
               ELSE next_ts END AS nearest_ts
      FROM b JOIN f USING (event_id))
    SELECT event_id, user_id, ts AS purchase_ts,
           nearest_ts AS nearest_view_ts,
           abs(epoch_us(ts) - epoch_us(nearest_ts)) AS gap_us
    FROM c
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of: for each purchase, the temporally closest view
    by the same user in EITHER direction, ties to the earlier view —
    completing the as-of family (backward join_asof, forward
    join_asof_forward).  Both directional candidates come from the
    same merged per-user timeline: one shuffle, ONE sort, two window
    passes over the identical (user_id, t, side) order (the physical
    plan shares the exchange and sort), then a pure map-side pick of
    the smaller microsecond gap.  The oracle runs two native ASOF
    joins and the same CASE — integer microsecond arithmetic on both
    sides, so the tie-break can never diverge."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    left = purchases.select(
        "user_id",
        F.col("purchase_ts").alias("t"),
        F.lit(1).alias("side"),
        "event_id",
        "purchase_ts",
        F.lit(None).cast("timestamp_ntz").alias("view_ts"),
    )
    right = views.select(
        "user_id",
        F.col("view_ts").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("purchase_ts"),
        "view_ts",
    )
    base = Window.partitionBy("user_id").orderBy("t", "side")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    merged = (
        left.unionByName(right)
        .withColumn("prev_ts", F.last("view_ts", ignorenulls=True).over(wb))
        .withColumn("next_ts", F.first("view_ts", ignorenulls=True).over(wf))
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    back_gap = us("purchase_ts") - us("prev_ts")
    fwd_gap = us("next_ts") - us("purchase_ts")
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(back_gap <= fwd_gap, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        "purchase_ts",
        nearest.alias("nearest_view_ts"),
        F.abs(
            us("purchase_ts")
            - F.unix_micros(nearest.cast("timestamp"))
        ).alias("gap_us"),
    )


_ASOF_TOL_US = 3_600_000_000  # 1 hour


@query(
    "join_asof_tolerance",
    oracle=f"""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= {_ASOF_TOL_US}
                THEN v.ts END AS view_ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= {_ASOF_TOL_US}
                THEN epoch_us(p.ts) - epoch_us(v.ts) END AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pd.merge_asof's `tolerance`):
    the nearest-prior view still matches only if it happened within
    1 hour of the purchase; staler matches degrade to NULL exactly as
    an unmatched row would. Same single-shuffle union+last(ignorenulls)
    timeline as join_asof — the tolerance is a pure map-side gate on
    the carried match, so the plan (and its 100 TB behavior) is
    unchanged from the base as-of."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    left = purchases.select(
        "user_id", F.col("purchase_ts").alias("t"),
        F.lit(1).alias("side"), "event_id", "purchase_ts",
        F.lit(None).cast("timestamp_ntz").alias("view_ts"),
    )
    right = views.select(
        "user_id", F.col("view_ts").alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp_ntz").alias("purchase_ts"),
        "view_ts",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "matched_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    gap = (
        F.unix_micros(F.col("purchase_ts").cast("timestamp"))
        - F.unix_micros(F.col("matched_view_ts").cast("timestamp"))
    )
    in_tol = gap <= _ASOF_TOL_US
    return merged.filter(F.col("side") == 1).select(
        "event_id", "user_id", "purchase_ts",
        F.when(in_tol, F.col("matched_view_ts")).alias("view_ts"),
        F.when(in_tol, gap).alias("gap_us"),
    )
