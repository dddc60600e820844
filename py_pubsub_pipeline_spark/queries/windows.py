"""Window functions: ranking, analytic (lag/lead/first/last), ROWS and
RANGE frames, top-k per group.

Determinism: every window ORDER BY ends in a unique key so ranks and
frame contents are total-ordered (ties would otherwise hash-mismatch
across engines). Running double sums go through DECIMAL (DuckDB
evaluates sliding sums with a segment tree whose accumulation order
differs from Spark's sequential scan).

Scale notes: partitionBy keys (c_mktsegment, o_custkey, user_id) give
bounded per-partition state; no global single-partition window appears
outside sort_multi's test-only global row_number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           NTILE(4)      OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over a per-segment ordered window."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_analytic",
    oracle="""
    SELECT event_id, user_id, ts, value,
           LAG(value)       OVER w AS prev_value,
           LEAD(event_type) OVER w AS next_type,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per user ordered by event time."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"),
    )


@query(
    "win_frame_rows",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_last3
    FROM orders
    """,
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals with explicit ROWS frames (cumulative + sliding)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.count("*").over(w.rowsBetween(-2, Window.currentRow)).alias("n_last3"),
    )


@query(
    "win_frame_range",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_last_hour
    FROM (SELECT *, epoch_us(ts) AS ts_us FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time (trailing 1 hour per user), ordered
    by epoch microseconds so both engines use identical arithmetic."""
    e = table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_last_hour"),
    )


@query(
    "win_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number + filter. Spark rewrites
    the rank filter into a per-partition top-k (WindowGroupLimit), so
    no full sort materializes at scale."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    o = table(spark, sf_dir, "orders")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "win_dist",
    oracle="""
    SELECT c_custkey, c_nationkey,
           FLOOR(PERCENT_RANK() OVER w * 1000000 + 0.5) / 1000000 AS pr,
           FLOOR(CUME_DIST()   OVER w * 1000000 + 0.5) / 1000000 AS cd,
           NTILE(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    ntile per nation, ordered by a unique (acctbal, custkey) key so
    ranks are total and the quartile split is deterministic.

    Rounding: floor(x*1e6 + 0.5) on BOTH engines, not ROUND(x, 6) —
    percent_rank emits fractions like 41/640 whose nearest double sits
    just under the .5 boundary; Spark's ROUND re-reads the double's
    SHORTEST decimal form ("0.0640625" -> half-up -> ...63) while
    DuckDB rounds the raw binary value (-> ...62). The explicit floor
    runs the identical double arithmetic on both sides (first seen as
    a 3-row hash mismatch at sf0.1; sf0.01 has no boundary fraction)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")

    def _r6(col: Column) -> Column:
        return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return c.select(
        "c_custkey",
        "c_nationkey",
        _r6(F.percent_rank().over(w)).alias("pr"),
        _r6(F.cume_dist().over(w)).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_time_range",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_prev_hour,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6)
             AS sum_prev_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per-user rolling one-hour count/sum —
    the frame is bounded by TIME, not row position, so co-timed and
    bursty events are handled correctly. Runs as one shuffle on
    user_id + an in-partition ordered scan (no self-join
    re-materialization of the hour window).

    Frame arithmetic is in MICROSECONDS (unix_micros / epoch_us on both
    sides): events carry sub-second timestamps, and a whole-second
    ordering key would merge distinct sub-second instants into one
    RANGE peer group, diverging from the timestamp-precision frame."""
    ev = table(spark, sf_dir, "events")
    # RANGE needs a numeric ordering key; use microseconds to keep the
    # full timestamp precision (1 hour = 3_600_000_000 us).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_prev_hour"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 6
        ).alias("sum_prev_hour"),
    )


@query(
    "win_skyline_pareto",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS prio, o_totalprice, o_orderdate,
             MIN(o_orderdate) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS best_prev_date
      FROM orders
    )
    SELECT prio, o_totalprice, o_orderdate
    FROM s
    WHERE best_prev_date IS NULL OR o_orderdate < best_prev_date
    """,
)
def win_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) query per priority class: orders not
    dominated on (totalprice maximize, orderdate minimize) — the
    classic multi-criteria OLAP operator ("expensive AND early"),
    computed by the sort-filter skyline algorithm: scan in price-desc
    order keeping a running best (minimum) date; a row survives iff it
    beats every higher-priced row's date. Duplicate (price, date)
    points collapse to one representative (the window's unique-key
    ORDER BY makes which one deterministic — the predicate's outcome
    depends only on the dominated values).

    Scale: the window sorts WITHIN each priority partition — one
    ordered scan per group, no self-join (the naive NOT EXISTS
    formulation is quadratic). For few/huge groups, pre-prune with a
    price-binned per-bin min-date grid and apply the same window to
    survivors — same plan shape, input cut by orders of magnitude."""
    o = table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_orderpriority")
         .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        o.select(
            F.col("o_orderpriority").alias("prio"),
            "o_totalprice", "o_orderdate",
            F.min("o_orderdate").over(w).alias("best_prev_date"),
        )
        .filter(F.col("best_prev_date").isNull()
                | (F.col("o_orderdate") < F.col("best_prev_date")))
        .select("prio", "o_totalprice", "o_orderdate")
    )


@query(
    "win_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER
                   (PARTITION BY event_type), 6) AS p_transition
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def win_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user journeys: for
    each consecutive event pair within a user's timeline, the count
    and row-normalized probability of (from -> to) — the path-analysis
    primitive behind funnel discovery (funnel_conversion checks ONE
    hypothesized path; this surfaces all observed steps).

    Plan: one LEAD window on the user_id exchange (same single-
    shuffle discipline as sessionize_gaps — unique ORDER BY via
    event_id), a hash agg to the |types|^2-sized matrix, and the
    row normalization as a window over that tiny aggregate. The
    probability divides two exact counts — deterministic on both
    engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").cast("long").alias("n"))
    wrow = Window.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wrow), 6)
        .alias("p_transition"),
    )


@query(
    "win_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6))
               AS net
      FROM events GROUP BY 1, 2
    ), eq AS (
      SELECT event_type, day,
             SUM(net) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS equity
      FROM daily
    ), curve AS (
      SELECT event_type, equity,
             MAX(equity) OVER (PARTITION BY event_type ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS peak
      FROM eq
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(peak - equity) AS DOUBLE) AS max_drawdown,
           CAST(MAX(peak) AS DOUBLE) AS peak_equity
    FROM curve GROUP BY event_type
    """,
)
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative value curve per event type:
    the largest peak-to-trough drop of the running total — the risk
    statistic behind every equity/SLA-budget chart, and the nested-
    window composite (a running MAX **of** a running SUM) that
    exercises window-over-window planning.

    Plan: the event stream first collapses to a per-day net (hash
    agg — the spine discipline of ts_concurrency_peak: windows walk
    days, not events), then BOTH windows ride one event_type
    exchange. All arithmetic stays in exact DECIMAL until the final
    output cast."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,6)"))
          .cast("decimal(28,6)").alias("net"))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    eq = daily.select(
        "event_type", "day", F.sum("net").over(w).alias("equity"))
    curve = eq.select(
        "event_type", "equity", F.max("equity").over(w).alias("peak"))
    return curve.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.max(F.col("peak") - F.col("equity")).cast("double")
        .alias("max_drawdown"),
        F.max("peak").cast("double").alias("peak_equity"),
    )


_COAL_DUR_S = 300


@query(
    "win_interval_coalesce",
    oracle=f"""
    WITH iv AS (
      SELECT user_id,
             epoch_us(ts) // 1000000 AS s,
             epoch_us(ts) // 1000000 + {_COAL_DUR_S} AS e
      FROM events
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                  THEN 1 ELSE 0 END AS is_new
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), merged AS (
      SELECT user_id, island,
             MIN(s) AS m_start, MAX(e) AS m_end
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_merged,
           CAST(SUM(m_end - m_start) AS BIGINT) AS covered_s,
           CAST(MAX(m_end - m_start) AS BIGINT) AS longest_s
    FROM merged GROUP BY user_id
    """,
)
def win_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing: merge each user's overlapping
    {_COAL_DUR_S}-second activity slots into maximal covering spans
    and report span count / covered seconds / longest span — the
    gaps-and-islands MERGE (win_streaks finds runs of a predicate;
    this unions a set of [start, end) intervals). Covered time is
    the billing/engagement number double-counting inflates if you
    just sum durations.

    Plan: the island mark (start beats the running MAX of prior
    ends), the island number (running sum of marks), and the
    per-island agg all ride ONE user_id exchange — sessionize_gaps'
    single-exchange discipline generalized to intervals that carry
    their own widths. Exact integer seconds end to end."""
    e = table(spark, sf_dir, "events")
    sec = (F.unix_micros(F.col("ts").cast("timestamp"))
           / F.lit(1_000_000)).cast("long")
    iv = e.select("user_id", sec.alias("s"),
                  (sec + _COAL_DUR_S).alias("e"))
    wprev = (Window.partitionBy("user_id").orderBy("s", "e")
             .rowsBetween(Window.unboundedPreceding, -1))
    marked = iv.select(
        "user_id", "s", "e",
        F.when(F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)),
               1).otherwise(0).alias("is_new"),
    )
    wrun = (Window.partitionBy("user_id").orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    islands = marked.select(
        "user_id", "s", "e",
        F.sum("is_new").over(wrun).alias("island"))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("m_start"), F.max("e").alias("m_end"))
    return merged.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_merged"),
        F.sum(F.col("m_end") - F.col("m_start")).cast("long")
        .alias("covered_s"),
        F.max(F.col("m_end") - F.col("m_start")).cast("long")
        .alias("longest_s"),
    )


_RCORR_W = 7  # rolling window: 7 daily points


@query(
    "win_rolling_corr",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value END
                           AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS x,
             CAST(CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                           END AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ), roll AS (
      SELECT day,
             COUNT(*) OVER w AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sy,
             CAST(SUM(CAST(x*x AS DECIMAL(28,9))) OVER w AS DOUBLE)
               AS sxx,
             CAST(SUM(CAST(y*y AS DECIMAL(28,9))) OVER w AS DOUBLE)
               AS syy,
             CAST(SUM(CAST(x*y AS DECIMAL(28,9))) OVER w AS DOUBLE) AS sxy
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {_RCORR_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           ROUND((n * sxy - sx * sy)
                 / SQRT(GREATEST((n * sxx - sx * sx)
                                 * (n * syy - sy * sy), 1e-12)), 6)
             AS rolling_corr
    FROM roll WHERE n = {_RCORR_W}
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {_RCORR_W}-day correlation between the click and
    purchase value series: the co-movement monitor — a stable
    positive correlation that suddenly decays is the first sign one
    of two coupled metrics broke (tracking loss, bot traffic),
    caught before either metric's own level alarms. Rolling
    correlation = six rolling co-moment sums in ONE frame, then the
    Pearson formula per row; partial head windows drop (n = w only).

    Plan: day-spine pivot agg (conditional sums, one pass), then all
    six co-moments ride a single bounded ROWS frame over the spine —
    per-term DECIMAL quantization inside the frame sums, variance
    product clamped before the sqrt."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", F.col("value"))
              .cast("decimal(18,6)")).cast("double").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))
              .cast("decimal(18,6)")).cast("double").alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-(_RCORR_W - 1), Window.currentRow)

    def rs(e_, p, sc):
        return F.sum(e_.cast(f"decimal({p},{sc})")).over(w).cast("double")

    roll = daily.select(
        "day",
        F.count("*").over(w).alias("n"),
        rs(F.col("x"), 18, 6).alias("sx"), rs(F.col("y"), 18, 6).alias("sy"),
        rs(F.col("x") * F.col("x"), 28, 9).alias("sxx"),
        rs(F.col("y") * F.col("y"), 28, 9).alias("syy"),
        rs(F.col("x") * F.col("y"), 28, 9).alias("sxy"),
    )
    n = F.col("n")
    corr = ((n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(F.greatest(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(1e-12))))
    return (roll.filter(n == _RCORR_W)
            .select("day", F.round(corr, 6).alias("rolling_corr")))


_PATH_LEN = 4
_PATH_TOP = 15


@query(
    "win_journey_paths",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= {_PATH_LEN}
      GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT {_PATH_TOP}
    """,
)
def win_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP JOURNEY PATHS — the full-sequence view the Markov ops
    compress away: win_event_transitions keeps only first-order
    (A→B) statistics, but product questions are about PATHS
    ('signup>browse>cart>abandon vs signup>cart>buy'); this ranks
    the {_PATH_TOP} most common first-{_PATH_LEN}-event sequences —
    the onboarding-flow fingerprint. ts_markov_entropy_rate says how
    predictable journeys are; this says WHICH journeys.

    Exactness: per-user ordering is total ((ts, event_id)); the path
    string aggregates under that explicit order on both engines
    (never engine-default collect order); counts exact, LIMIT under
    (count DESC, path) — total.

    Scale: one user-partitioned rank window (bounded by per-user
    events), one user-keyed path agg, one path-bounded count —
    paths live in |types|^{_PATH_LEN} space, schema-bounded. The
    rank-≤-{_PATH_LEN} filter caps state per user BEFORE the path
    build, so a power user costs the same as a casual one."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _PATH_LEN)
    paths = ordered.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).getField("event_type"),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(_PATH_TOP)
    )


@query(
    "win_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value, ts,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS nxt
      FROM events
    ), weighted AS (
      SELECT user_id,
             epoch_us(nxt) - epoch_us(ts) AS w_us,
             value
      FROM seg WHERE nxt IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(w_us) AS BIGINT) AS total_us,
           ROUND(CAST(CAST(SUM(CAST(value * w_us AS DECIMAL(28,4))) AS STRING) AS DOUBLE)
                 / SUM(w_us), 6) AS twa_value
    FROM weighted GROUP BY user_id
    """,
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED AVERAGE — the correct 'average level' for
    irregularly-sampled state (TWAP in markets, average queue depth,
    mean feature-flag exposure): a plain AVG over events weights each
    OBSERVATION equally, silently overweighting bursty periods; here
    each value persists until the user's next event and is weighted
    by that holding duration (step-function integral / elapsed time
    — ts_littles_law's integral, per user, divided by time; the last
    unclosed segment is excluded, the Kaplan-Meier censoring
    posture).

    Exactness: durations are exact epoch-microsecond BIGINTs; each
    value·duration product quantizes through DECIMAL(28,4) before
    the sum (order-independent); one rounded division per user.

    Scale: one per-user LEAD window (the sessionize_gaps shuffle)
    and one user-keyed agg — fact-shaped but single-pass; at 100 TB
    the window partitions by the same user key downstream session
    analytics already shuffle on."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id", "value", "ts", F.lead("ts").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    # events.ts reads as TIMESTAMP_NTZ; the UTC session tz makes the
    # cast to instant exact, and only the DIFFERENCE is used anyway.
    w_us = (
        F.unix_micros(F.col("nxt").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    )
    weighted = seg.select(
        "user_id", w_us.alias("w_us"), "value"
    )
    return weighted.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum("w_us").cast("long").alias("total_us"),
        F.round(
            F.sum((F.col("value") * F.col("w_us")).cast("decimal(28,4)"))
            .cast("double") / F.sum("w_us"), 6
        ).alias("twa_value"),
    )
