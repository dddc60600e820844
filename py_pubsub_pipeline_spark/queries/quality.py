"""Training-data pipeline utilities: reproducible sampling/splits,
column profiling, batch sessionization.

These are the everyday ops of a 100 TB corpus pipeline that don't fit
the classic relational families: carve out a deterministic sample,
split train/test WITHOUT a random() that varies by engine/run/task
retry, profile a table before training, and sessionize event logs.

Determinism strategy for sampling: hash-gate on md5 of a stable key.
Both engines produce the identical hex digest for the identical
string, so membership is a pure function of the row — reproducible
across engines, partitionings, retries, and scale factors (a row's
fate never depends on which task saw it, unlike rand()-based
sampling). This is how production corpus pipelines pin their
holdout sets.

Scale notes: every op here is one scan + one (or zero) shuffles.
sample/split are pure map-side filters/projections — no shuffle at
all until the summarizing agg; profiling is a single multi-aggregate
pass (one shuffle of partial agg rows); sessionization shuffles once
by user_id then runs sorted window + agg inside each partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exprs import dsum, sql_dsum
from ..functions.splitwin import split_window
from ..registry import query
from ..tables import table

# First two hex chars of md5 < '1a' (26/256) ~ 10.2% sample.
_SAMPLE_GATE = "1a"
# First two hex chars < 'cc' (204/256) ~ 79.7% -> train, else test.
_SPLIT_GATE = "cc"


def _hash2(key: F.Column) -> F.Column:
    return F.substring(F.md5(key.cast("string")), 1, 2)


@query(
    "sample_hash",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '{_SAMPLE_GATE}'
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample of orders, gated on the md5 of the
    key. A pure map-side filter: no shuffle, no state, no seed to
    disagree about — the same rows are sampled on any engine at any
    parallelism. (Spark's df.sample() is seeded per-partition, so its
    output changes with the partitioning; hash-gating is the
    scale-stable way.)"""
    o = table(spark, sf_dir, "orders")
    return o.filter(_hash2(F.col("o_orderkey")) < _SAMPLE_GATE).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "split_train_test",
    oracle=f"""
    SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)
                     < '{_SPLIT_GATE}'
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n, {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY 1
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~80/20 train/test split by key hash, summarized
    per split. The split label is a pure function of the row key:
    re-running at 1000x scale, after repartitioning, or on a
    different engine assigns every order the same way — the property
    a training pipeline needs so the holdout never leaks."""
    o = table(spark, sf_dir, "orders")
    split = F.when(
        _hash2(F.col("o_orderkey")) < _SPLIT_GATE, F.lit("train")
    ).otherwise(F.lit("test"))
    return (
        o.select(split.alias("split"), "o_totalprice")
        .groupBy("split")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "sum_price"))
    )


@query(
    "profile_stats",
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(l_quantity) AS nn_qty,
             COUNT(DISTINCT l_quantity) AS ndv_qty,
             CAST(MIN(l_quantity) AS VARCHAR) AS min_qty,
             CAST(MAX(l_quantity) AS VARCHAR) AS max_qty,
             COUNT(l_extendedprice) AS nn_price,
             COUNT(DISTINCT l_extendedprice) AS ndv_price,
             CAST(MIN(l_extendedprice) AS VARCHAR) AS min_price,
             CAST(MAX(l_extendedprice) AS VARCHAR) AS max_price,
             COUNT(l_returnflag) AS nn_flag,
             COUNT(DISTINCT l_returnflag) AS ndv_flag,
             MIN(l_returnflag) AS min_flag,
             MAX(l_returnflag) AS max_flag
      FROM lineitem)
    SELECT 'l_quantity' AS column_name, n_rows - nn_qty AS n_null,
           ndv_qty AS n_distinct, min_qty AS min_str, max_qty AS max_str
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', n_rows - nn_price, ndv_price,
           min_price, max_price FROM m
    UNION ALL
    SELECT 'l_returnflag', n_rows - nn_flag, ndv_flag,
           min_flag, max_flag FROM m
    """,
)
def profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the pre-training `ANALYZE`): null count,
    exact NDV, min/max for three lineitem columns, one output row per
    column. All thirteen aggregates come out of a SINGLE scan — the
    stack() pivot to rows happens on the one-row aggregate result,
    not the fact table. Exact multi-column COUNT(DISTINCT) plans via
    Spark's expand + two-phase agg; at 100 TB swap NDV to
    approx_count_distinct (HLL, one pass, mergeable) — the agg_approx
    query covers that path."""
    li = table(spark, sf_dir, "lineitem")
    # NDVs run in their own pass, SEPARATE from min/max/count: mixing
    # COUNT(DISTINCT) with other aggregates makes Catalyst's distinct
    # rewrite wrap the others in first(...) FILTER aggregates, which
    # have no fixed-size hash buffer -> the whole Expand output falls
    # back to sort-based aggregation (measured 3.4s vs 0.4s for the
    # two-pass plan at sf0.1). Two single-row results cross-join for
    # free.
    base = li.agg(
        F.count("*").alias("n_rows"),
        F.count("l_quantity").alias("nn_qty"),
        F.min("l_quantity").cast("string").alias("min_qty"),
        F.max("l_quantity").cast("string").alias("max_qty"),
        F.count("l_extendedprice").alias("nn_price"),
        F.min("l_extendedprice").cast("string").alias("min_price"),
        F.max("l_extendedprice").cast("string").alias("max_price"),
        F.count("l_returnflag").alias("nn_flag"),
        F.min("l_returnflag").alias("min_flag"),
        F.max("l_returnflag").alias("max_flag"),
    )
    ndv = li.agg(
        F.countDistinct("l_quantity").alias("ndv_qty"),
        F.countDistinct("l_extendedprice").alias("ndv_price"),
        F.countDistinct("l_returnflag").alias("ndv_flag"),
    )
    m = base.crossJoin(ndv)
    return m.select(
        F.expr(
            "stack(3, "
            " 'l_quantity', n_rows - nn_qty, ndv_qty, min_qty, max_qty,"
            " 'l_extendedprice', n_rows - nn_price, ndv_price,"
            "   min_price, max_price,"
            " 'l_returnflag', n_rows - nn_flag, ndv_flag,"
            "   min_flag, max_flag)"
            " AS (column_name, n_null, n_distinct, min_str, max_str)"
        )
    )


@query(
    "sessionize_gaps",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (30 min), the window-
    function formulation: flag session starts with LAG, number
    sessions with a running sum, aggregate per (user, session). One
    shuffle on user_id; the two windows and the final agg all share
    that partitioning (a single exchange in the plan). This is the
    batch twin of stream_session / the stateful sessionizer — three
    independent formulations of the same semantics, cross-checked.
    Ties on ts break by event_id so numbering is deterministic."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = F.col("ts") - F.lag("ts").over(w) <= F.expr(
        "INTERVAL 30 MINUTES"
    )
    flagged = e.select(
        "user_id", "ts", "event_id",
        F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)).alias("is_new"),
    )
    numbered = flagged.withColumn(
        "sess_id",
        F.sum("is_new").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return numbered.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    ).select("user_id", "session_start", "session_end", "n_events")


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (the profiling companion
    to profile_stats): bin id = floor(x / width), one hash agg, a few
    dozen groups — partial aggregation collapses it map-side, the
    exchange moves one row per partition per bin. The same shape at
    100 TB; for data-dependent bins swap the constant width for
    approx quantile boundaries (agg_percentile covers that path)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bin")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "dq_checks",
    oracle="""
    SELECT 'orders.pk_unique' AS check_name,
           (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
             AS n_violations
    UNION ALL
    SELECT 'orders.custkey_not_null',
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
    UNION ALL
    SELECT 'orders.totalprice_positive',
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'orders.status_in_domain',
           (SELECT COUNT(*) FROM orders
            WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
    UNION ALL
    SELECT 'lineitem.fk_orders',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem.discount_in_range',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_discount < 0 OR l_discount > 1)
    ORDER BY check_name
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality assertion suite (the pre-training-pipeline gate):
    primary-key uniqueness, null checks, domain/range checks, and
    referential integrity — each as a violation COUNT so the output
    is a small audit table, not a boolean that hides magnitude.

    Plan shape: the four orders checks come out of ONE scan (a single
    multi-aggregate — Catalyst collapses the branches); the range
    check is a second single-scan agg on lineitem; RI is a LEFT ANTI
    join that ships only the two key columns. Nothing here is
    per-check re-scans: at 100 TB this runs as two fact scans + one
    key-only anti join regardless of how many checks ride along."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    orders_checks = o.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("pk"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("nul"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("pos"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)
        ).alias("dom"),
    )
    li_range = li.agg(
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("rng")
    )
    ri = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("ri"))
    )
    wide = orders_checks.join(F.broadcast(li_range)).join(F.broadcast(ri))
    checks = [
        ("orders.pk_unique", "pk"),
        ("orders.custkey_not_null", "nul"),
        ("orders.totalprice_positive", "pos"),
        ("orders.status_in_domain", "dom"),
        ("lineitem.fk_orders", "ri"),
        ("lineitem.discount_in_range", "rng"),
    ]
    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) AS (check_name, n_violations)".format(
                n=len(checks),
                args=", ".join(f"'{name}', {col}" for name, col in checks),
            )
        )
    )
    return stacked.orderBy("check_name")


@query(
    "sample_stratified",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_sampled,
           COUNT(DISTINCT o_orderkey) AS n_keys
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <
          CASE o_orderstatus
            WHEN 'F' THEN '0d'  -- ~5%
            WHEN 'O' THEN '1a'  -- ~10%
            ELSE '80'           -- ~50%
          END
    GROUP BY o_orderstatus
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with PER-STRATUM rates (the sampleBy shape:
    downsample the majority class, keep the rare one) — but md5-gated
    like sample_hash, so membership is a pure function of the key:
    identical across engines, partitionings, retries, and runs. The
    gate is a map-side filter — no shuffle, no rand(), and the stratum
    rates are data (a literal map), not code."""
    o = table(spark, sf_dir, "orders")
    gate = (
        F.when(F.col("o_orderstatus") == "F", "0d")
        .when(F.col("o_orderstatus") == "O", "1a")
        .otherwise("80")
    )
    return (
        o.filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < gate
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_sampled"),
            F.countDistinct("o_orderkey").alias("n_keys"),
        )
    )


@query(
    "sample_importance",
    oracle="""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             len(list_distinct(string_split(text, ' '))) AS n_uniq,
             len(string_split(text, ' ')) AS n_tok
      FROM documents)
    WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) AS DECIMAL(38,0)) * n_tok
          < CAST(n_uniq AS DECIMAL(38,0)) * 4294967296
    """,
)
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling with a PER-ROW keep probability: each doc
    survives with probability equal to its lexical-diversity score
    (n_uniq / n_tokens) — the quality-weighted downsampling step of a
    data-mixing pipeline (cf. per-GROUP rates in sample_balanced).

    The gate is exact integer arithmetic end to end: u (md5 of the
    doc id, uniform on [0, 2^32)) keeps iff u * n_tok < n_uniq * 2^32
    — the score never materializes as a float, so no boundary row can
    flip between engines; decimal(38,0) widening forbids int64 wrap.
    Map-side only: no shuffle, partitioning- and retry-invariant."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        d.select(
            "doc_id", "lang",
            F.size(F.array_distinct(toks)).alias("n_uniq"),
            F.size(toks).alias("n_tok"),
            u.alias("u"),
        )
        .filter(
            F.col("u").cast("decimal(38,0)") * F.col("n_tok")
            < F.col("n_uniq").cast("decimal(38,0)") * F.lit(4294967296)
        )
        .select("doc_id", "lang")
    )


_PSI_BUCKETS = 10


@query(
    "dq_drift_psi",
    oracle=f"""
    WITH vmax AS (SELECT MAX(value) AS m FROM events),
    b AS (
      SELECT event_type, event_id % 2 AS half,
             LEAST({_PSI_BUCKETS - 1},
                   CAST(FLOOR(value / (m / {_PSI_BUCKETS})) AS INT))
               AS bucket
      FROM events, vmax),
    cnt AS (
      SELECT event_type, half, bucket, COUNT(*) AS n
      FROM b GROUP BY 1, 2, 3),
    tot AS (
      SELECT event_type, half, SUM(n) AS t FROM cnt GROUP BY 1, 2),
    spine AS (
      SELECT DISTINCT c.event_type, g.bucket
      FROM cnt c, UNNEST(generate_series(0, {_PSI_BUCKETS - 1})) g(bucket)),
    p AS (
      SELECT s.event_type, s.bucket,
             (COALESCE(r.n, 0) + 1.0)
               / (rt.t + {_PSI_BUCKETS}) AS p_ref,
             (COALESCE(c.n, 0) + 1.0)
               / (ct.t + {_PSI_BUCKETS}) AS p_cur
      FROM spine s
      LEFT JOIN cnt r ON r.event_type = s.event_type
                     AND r.bucket = s.bucket AND r.half = 0
      LEFT JOIN cnt c ON c.event_type = s.event_type
                     AND c.bucket = s.bucket AND c.half = 1
      JOIN tot rt ON rt.event_type = s.event_type AND rt.half = 0
      JOIN tot ct ON ct.event_type = s.event_type AND ct.half = 1)
    SELECT event_type,
           ROUND(SUM((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi
    FROM p
    GROUP BY event_type
    """,
)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two halves of the stream —
    the standard drift monitor between a reference window and a
    current window, per event type. Values bucket into {_PSI_BUCKETS}
    fixed-width bins (edges from the global max, an exact 1-row
    scalar), proportions take add-one smoothing so empty bins can't
    blow up the log, and psi = sum((p_cur - p_ref) * ln(p_cur/p_ref)).

    Scale: two bounded hash aggs (cells <= types x halves x bins) on
    one scan, a bin-spine outer join of dim-sized tables, and a
    final bounded agg — nothing event-sized past the first agg. The
    halves here split on event_id parity for determinism; production
    splits on time windows, same plan."""
    ev = table(spark, sf_dir, "events")
    vmax = ev.agg(F.max("value").alias("m"))
    b = ev.join(F.broadcast(vmax)).select(
        "event_type",
        (F.col("event_id") % 2).alias("half"),
        F.least(
            F.lit(_PSI_BUCKETS - 1),
            F.floor(F.col("value") / (F.col("m") / _PSI_BUCKETS))
            .cast("int"),
        ).alias("bucket"),
    )
    cnt = b.groupBy("event_type", "half", "bucket").agg(
        F.count("*").alias("n")
    )
    tot = cnt.groupBy("event_type", "half").agg(F.sum("n").alias("t"))
    spine = (
        cnt.select("event_type").distinct()
        .crossJoin(
            spark.range(_PSI_BUCKETS)
            .select(F.col("id").cast("int").alias("bucket"))
        )
    )
    r = cnt.filter(F.col("half") == 0).select(
        "event_type", "bucket", F.col("n").alias("n_ref")
    )
    c = cnt.filter(F.col("half") == 1).select(
        "event_type", "bucket", F.col("n").alias("n_cur")
    )
    rt = tot.filter(F.col("half") == 0).select(
        "event_type", F.col("t").alias("t_ref")
    )
    ct = tot.filter(F.col("half") == 1).select(
        "event_type", F.col("t").alias("t_cur")
    )
    p = (
        spine.join(r, ["event_type", "bucket"], "left")
        .join(c, ["event_type", "bucket"], "left")
        .join(rt, "event_type")
        .join(ct, "event_type")
        .select(
            "event_type",
            (
                (F.coalesce(F.col("n_ref"), F.lit(0)) + F.lit(1.0))
                / (F.col("t_ref") + _PSI_BUCKETS)
            ).alias("p_ref"),
            (
                (F.coalesce(F.col("n_cur"), F.lit(0)) + F.lit(1.0))
                / (F.col("t_cur") + _PSI_BUCKETS)
            ).alias("p_cur"),
        )
    )
    return p.groupBy("event_type").agg(
        F.round(
            F.sum(
                (F.col("p_cur") - F.col("p_ref"))
                * F.log(F.col("p_cur") / F.col("p_ref"))
            ),
            6,
        ).alias("psi")
    )


_RESERVOIR_K = 1000


@query(
    "sample_reservoir",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT {_RESERVOIR_K}
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k uniform sample ("hash reservoir"): take
    the k rows with the smallest md5(key). Unlike a true reservoir
    (stream-order-dependent) or df.sample() (partitioning-dependent),
    membership is a pure function of the key — the same k rows at any
    parallelism, on any engine, across retries — yet it is still an
    exact-size uniform sample because md5 ranks keys pseudo-randomly.

    Plan: TakeOrderedAndProject — each task keeps its local top-k
    (k=1000 rows in memory), the driver merges P partial lists; no
    global sort, no full shuffle. Scale cost is O(k) memory per task
    regardless of input size."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice",
                 F.md5(F.col("o_orderkey").cast("string")).alias("_h"))
        .orderBy("_h", "o_orderkey")
        .limit(_RESERVOIR_K)
        .drop("_h")
    )


_K_ANON = 10


@query(
    "privacy_k_anonymity",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) < {_K_ANON} AS risky
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (nation, market segment): every equivalence class with fewer than
    k={_K_ANON} members is re-identification-risky and must be
    suppressed or generalized before release — the standard privacy
    gate before publishing a derived dataset (companion to
    text_pseudonymize, which handles direct identifiers).

    Plan: one hash agg keyed by the quasi-identifiers; shuffle volume
    is one row per class. At 100 TB the class count, not the row
    count, bounds the exchange — add quasi-identifier columns and the
    plan shape is unchanged."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("n"),
        (F.count("*") < _K_ANON).alias("risky"),
    )


@query(
    "dq_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    )
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (), 6) AS observed_p,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_p,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER ()
                 - LOG10(1.0 + 1.0 / digit), 6) AS deviation
    FROM d GROUP BY digit
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order values: observed
    leading-digit shares against the log10(1 + 1/d) expectation — the
    classic fabricated-data / unit-mixing detector (a synthetic or
    truncated value column shows up as a flat or spiked digit profile
    long before any mean shifts). Output: one row per digit with the
    deviation a monitor alerts on.

    Plan: the digit is a map-side string op on the integer part (an
    explicit FLOOR on both sides — DuckDB's double->BIGINT cast
    ROUNDS while Spark's truncates), then a 9-group hash agg; the share normalization is a
    window over those 9 rows. Digit shares divide exact counts."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int").alias("digit"))
    counts = d.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy()
    obs = F.col("n").cast("double") / F.sum("n").over(w)
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return counts.select(
        "digit", "n",
        F.round(obs, 6).alias("observed_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(obs - benford, 6).alias("deviation"),
    )


_BOUNCE_GAP_MIN = 30  # same inactivity gap as sessionize_gaps


@query(
    "ts_bounce_rate",
    oracle=f"""
    WITH marks AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR date_diff('second', LAG(ts) OVER w, ts)
                      > {_BOUNCE_GAP_MIN * 60}
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             SUM(is_start) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM marks
    ), per_session AS (
      SELECT user_id, sess, COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, sess
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT)
             AS n_bounces,
           ROUND(CAST(COUNT(*) FILTER (WHERE n_events = 1) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
             AS avg_events_per_session
    FROM per_session
    """,
)
def ts_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate over gap-sessionized activity: the share of
    sessions containing exactly one event, plus average session depth
    — the engagement-quality headline on top of sessionize_gaps'
    session numbering (same {_BOUNCE_GAP_MIN}-minute inactivity gap,
    so the two reports always agree on what a session is).

    Plan: the LAG mark and the running session number share ONE
    user_id exchange (sessionize_gaps' single-exchange discipline),
    then per-session and global aggs. Ratios divide exact counts."""
    e = table(spark, sf_dir, "events")
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (F.unix_micros(F.col("ts").cast("timestamp"))
             - F.unix_micros(F.lag("ts").over(worder).cast("timestamp"))
             ) / 1_000_000
    marks = e.select(
        "user_id", "ts", "event_id",
        F.when(F.lag("ts").over(worder).isNull()
               | (gap_s > _BOUNCE_GAP_MIN * 60), 1).otherwise(0)
        .alias("is_start"),
    )
    wrun = (Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sessions = marks.select(
        "user_id", F.sum("is_start").over(wrun).alias("sess"))
    per_session = sessions.groupBy("user_id", "sess").agg(
        F.count("*").alias("n_events"))
    bounce = F.col("n_events") == 1
    return per_session.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.count_if(bounce).cast("long").alias("n_bounces"),
        F.round(F.count_if(bounce).cast("double") / F.count("*"), 6)
        .alias("bounce_rate"),
        F.round(F.sum("n_events").cast("double") / F.count("*"), 6)
        .alias("avg_events_per_session"),
    )


@query(
    "retention_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort
      FROM orders GROUP BY o_custkey
    ), sized AS (
      SELECT cohort, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort
    ), rev AS (
      SELECT f.cohort,
             date_diff('month', f.cohort,
                       CAST(date_trunc('month', o.o_orderdate) AS DATE))
               AS k,
             CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS STRING) AS DOUBLE)
               AS revenue
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT r.cohort, CAST(r.k AS INT) AS months_since,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           -- exact integer division in 1e-4-dollar units: no
           -- round-half boundary for either engine to disagree on
           CAST(CAST(SUM(CAST(r.revenue AS DECIMAL(28,2))) OVER (
                  PARTITION BY r.cohort ORDER BY r.k
                  ROWS UNBOUNDED PRECEDING) * 10000 AS BIGINT)
                // s.cohort_size AS BIGINT) AS cum_ltv_per_customer_e4
    FROM rev r JOIN sized s ON s.cohort = r.cohort
    """,
)
def retention_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative revenue per customer by
    acquisition-month cohort and months-since-acquisition — the
    payback chart next to retention_cohorts' return-rate matrix (rate
    says WHETHER they come back; this says what that's WORTH). The
    running sum turns the (cohort, month) revenue matrix into the
    curve a CAC threshold is drawn against. The per-customer value is
    reported in EXACT 1e-4-dollar integer units (cum * 10^4 integer-
    divided by cohort size): a rounded double here kept landing on
    round-half boundaries where the engines' tie rules disagree.

    Plan: first-order hash agg per customer, revenue hash agg per
    (cohort, k) — both map-side-partial, exchanges bounded by
    customers then by matrix cells — and the cumulative window walks
    the months-bounded spine per cohort. Money sums stay in
    DECIMAL(28,2) until the final per-customer division."""
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date")
        .alias("cohort"))
    sized = firsts.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    rev = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort",
            (F.months_between(
                F.date_trunc("month", F.col("o_orderdate")).cast("date"),
                F.col("cohort")).cast("int")).alias("k"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
             .cast("double").alias("revenue"))
    )
    return (
        rev.join(F.broadcast(sized), "cohort")
        .select(
            "cohort",
            F.col("k").cast("int").alias("months_since"),
            F.col("cohort_size").cast("long"),
            F.expr(
                "CAST(CAST(sum(CAST(revenue AS DECIMAL(28,2))) OVER ("
                "PARTITION BY cohort ORDER BY k "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                "* 10000 AS BIGINT) DIV cohort_size AS BIGINT)"
            ).alias("cum_ltv_per_customer_e4"),
        )
    )


_FRESH_STALE_H = 12


@query(
    "dq_freshness",
    oracle=f"""
    WITH g AS (SELECT MAX(ts) AS gmax FROM events),
    per AS (
      SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT p.event_type, p.last_ts,
           CAST(p.n AS BIGINT) AS n,
           CAST((epoch_us(g.gmax) - epoch_us(p.last_ts)) // 1000000
                AS BIGINT) AS lag_s,
           (epoch_us(g.gmax) - epoch_us(p.last_ts))
             > {_FRESH_STALE_H * 3600 * 1000000} AS stale
    FROM per p, g
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition freshness monitor: how far each event type's
    newest record lags the newest record anywhere, with a
    {_FRESH_STALE_H}-hour staleness flag — the first page of every
    data-ops runbook (a silent upstream producer shows up here hours
    before any volume metric moves).

    Plan: one grouped MAX + one global MAX (both map-side partial,
    one row per type), lag in exact integer microseconds."""
    e = table(spark, sf_dir, "events")
    g = e.agg(F.max("ts").alias("gmax"))
    per = e.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count("*").alias("n"))
    lag_us = (F.unix_micros(F.col("gmax").cast("timestamp"))
              - F.unix_micros(F.col("last_ts").cast("timestamp")))
    return per.crossJoin(F.broadcast(g)).select(
        "event_type", "last_ts",
        F.col("n").cast("long"),
        (lag_us / 1_000_000).cast("long").alias("lag_s"),
        (lag_us > _FRESH_STALE_H * 3600 * 1_000_000).alias("stale"),
    )


_NEYMAN_BUDGET = 1000


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH strata AS (
      SELECT c_mktsegment AS stratum,
             COUNT(*) AS nh,
             SQRT(GREATEST(
               CAST(CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,6))) AS STRING) AS DOUBLE) / COUNT(*)
               - POWER(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS STRING) AS DOUBLE) / COUNT(*), 2), 0.0)) AS sh
      FROM customer GROUP BY c_mktsegment
    ), z AS (
      SELECT SUM(nh) AS n_total,
             CAST(CAST(SUM(CAST(nh * sh AS DECIMAL(28,9))) AS STRING) AS DOUBLE) AS znh
      FROM strata
    )
    SELECT s.stratum, CAST(s.nh AS BIGINT) AS population,
           ROUND(s.sh, 6) AS stddev,
           ROUND({_NEYMAN_BUDGET}.0 * s.nh / z.n_total, 4)
             AS alloc_proportional,
           ROUND({_NEYMAN_BUDGET}.0 * s.nh * s.sh / z.znh, 4)
             AS alloc_neyman
    FROM strata s, z
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal survey allocation: given a {_NEYMAN_BUDGET}-row
    sampling budget across market segments, allocate in proportion to
    N_h * S_h (stratum size x stratum spread) — the allocation that
    minimizes the estimator's variance, shown beside the naive
    proportional split. This PLANS the rates that sample_stratified
    then executes: high-variance strata earn more budget than their
    headcount alone would give.

    Plan: one moments agg per stratum, one normalizer row, broadcast
    — everything past the first agg is strata-sized. The variance
    clamps at 0 (quantization guard) before sqrt; N_h*S_h terms
    quantize through DECIMAL before the normalizer sum."""
    c = table(spark, sf_dir, "customer")
    strata = c.groupBy(F.col("c_mktsegment").alias("stratum")).agg(
        F.count("*").alias("nh"),
        F.sqrt(F.greatest(
            F.sum((F.col("c_acctbal") * F.col("c_acctbal"))
                  .cast("decimal(38,6)")).cast("double") / F.count("*")
            - F.pow(F.sum(F.col("c_acctbal").cast("decimal(28,6)"))
                    .cast("double") / F.count("*"), 2),
            F.lit(0.0))).alias("sh"),
    )
    z = strata.agg(
        F.sum("nh").alias("n_total"),
        F.sum((F.col("nh") * F.col("sh")).cast("decimal(28,9)"))
        .cast("double").alias("znh"),
    )
    return strata.crossJoin(F.broadcast(z)).select(
        "stratum",
        F.col("nh").cast("long").alias("population"),
        F.round("sh", 6).alias("stddev"),
        F.round(F.lit(float(_NEYMAN_BUDGET)) * F.col("nh")
                / F.col("n_total"), 4).alias("alloc_proportional"),
        F.round(F.lit(float(_NEYMAN_BUDGET)) * F.col("nh") * F.col("sh")
                / F.col("znh"), 4).alias("alloc_neyman"),
    )


@query(
    "retention_growth_accounting",
    oracle="""
    WITH act AS (
      SELECT DISTINCT o_custkey AS u,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m
      FROM orders
    ), seq AS (
      SELECT u, m,
             LAG(m) OVER (PARTITION BY u ORDER BY m) AS prev_m
      FROM act
    )
    SELECT m AS month,
           CAST(COUNT(*) AS BIGINT) AS active,
           CAST(COUNT(*) FILTER (WHERE prev_m IS NULL) AS BIGINT)
             AS new_users,
           CAST(COUNT(*) FILTER (
             WHERE prev_m = m - INTERVAL 1 MONTH) AS BIGINT) AS retained,
           CAST(COUNT(*) FILTER (
             WHERE prev_m IS NOT NULL
               AND prev_m < m - INTERVAL 1 MONTH) AS BIGINT)
             AS resurrected
    FROM seq GROUP BY m
    """,
)
def retention_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: each month's active customers decomposed
    into NEW (first month ever), RETAINED (also active last month)
    and RESURRECTED (active before, but not last month) — the MAU
    decomposition every growth team reports (churn is the same
    decomposition read from the other side: last month's actives
    minus this month's retained). active = new + retained +
    resurrected holds by construction, which the oracle enforces
    row-by-row. Completes the engagement suite: retention_cohorts
    (who returns), ts_stickiness (how intensely), this (the monthly
    P&L of users).

    Plan: distinct (user, month) activity — the exchange is bounded
    by active pairs, not orders — one LAG window per user, and a
    month-keyed hash agg of the classification flags. Calendar-exact
    month arithmetic on DATE-truncated keys on both engines."""
    o = table(spark, sf_dir, "orders")
    act = o.select(
        F.col("o_custkey").alias("u"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("m"),
    ).distinct()
    seq = act.select(
        "u", "m",
        F.lag("m").over(Window.partitionBy("u").orderBy("m"))
        .alias("prev_m"),
    )
    prev_is_adjacent = F.col("prev_m") == F.add_months(F.col("m"), -1)
    return seq.groupBy(F.col("m").alias("month")).agg(
        F.count("*").cast("long").alias("active"),
        F.count_if(F.col("prev_m").isNull()).cast("long")
        .alias("new_users"),
        F.count_if(prev_is_adjacent).cast("long").alias("retained"),
        F.count_if(F.col("prev_m").isNotNull() & ~prev_is_adjacent)
        .cast("long").alias("resurrected"),
    )


@query(
    "dq_simpsons_paradox",
    oracle="""
    WITH armed AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
             o_orderpriority AS stratum, o_totalprice AS v
      FROM orders
    ), strata AS (
      SELECT stratum,
             CAST(SUM(CAST(v AS DECIMAL(28,2))) FILTER (WHERE arm = 'A')
                  AS DOUBLE)
               / COUNT(*) FILTER (WHERE arm = 'A') AS ma,
             CAST(SUM(CAST(v AS DECIMAL(28,2))) FILTER (WHERE arm = 'B')
                  AS DOUBLE)
               / COUNT(*) FILTER (WHERE arm = 'B') AS mb
      FROM armed GROUP BY stratum
    ), overall AS (
      SELECT CAST(SUM(CAST(v AS DECIMAL(28,2))) FILTER (WHERE arm = 'A')
                  AS DOUBLE)
               / COUNT(*) FILTER (WHERE arm = 'A')
             - CAST(SUM(CAST(v AS DECIMAL(28,2))) FILTER (WHERE arm = 'B')
                    AS DOUBLE)
               / COUNT(*) FILTER (WHERE arm = 'B') AS diff_all
      FROM armed
    )
    SELECT s.stratum,
           ROUND(s.ma - s.mb, 6) AS diff_stratum,
           ROUND(o.diff_all, 6) AS diff_overall,
           (s.ma - s.mb) * o.diff_all < 0 AS sign_reversed
    FROM strata s, overall o
    """,
)
def dq_simpsons_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector: the A-vs-B mean difference
    computed overall AND within each stratum, flagging strata whose
    effect sign REVERSES the aggregate's — the aggregation trap
    where a confounder (here priority mix) makes the pooled number
    say the opposite of every slice. Any dashboard that reports both
    a topline and slices needs exactly this audit before someone
    ships a decision off the wrong level.

    Plan: one conditional-aggregate pass per level (stratum hash agg
    + 1-row overall), broadcast of the single overall row; exact
    DECIMAL sums before each mean. The flag multiplies the two
    diffs — identical doubles both engines, no epsilon."""
    o = table(spark, sf_dir, "orders")
    armed = o.select(
        F.when(F.col("o_orderkey") % 2 == 0, "A").otherwise("B")
        .alias("arm"),
        F.col("o_orderpriority").alias("stratum"),
        F.col("o_totalprice").alias("v"),
    )

    def mean_arm(a):
        return (F.sum(F.when(F.col("arm") == a, F.col("v"))
                      .cast("decimal(28,2)")).cast("double")
                / F.count_if(F.col("arm") == a))

    strata = armed.groupBy("stratum").agg(
        mean_arm("A").alias("ma"), mean_arm("B").alias("mb"))
    overall = armed.agg((mean_arm("A") - mean_arm("B")).alias("diff_all"))
    return strata.crossJoin(F.broadcast(overall)).select(
        "stratum",
        F.round(F.col("ma") - F.col("mb"), 6).alias("diff_stratum"),
        F.round("diff_all", 6).alias("diff_overall"),
        ((F.col("ma") - F.col("mb")) * F.col("diff_all") < 0)
        .alias("sign_reversed"),
    )


@query(
    "dq_heartbeat_completeness",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             epoch_us(date_trunc('hour', MIN(ts))) // 3600000000 AS h0,
             epoch_us(date_trunc('hour', MAX(ts))) // 3600000000 AS h1,
             COUNT(DISTINCT epoch_us(date_trunc('hour', ts)) // 3600000000)
               AS observed
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(h1 - h0 + 1 AS BIGINT) AS expected_hours,
           CAST(observed AS BIGINT) AS observed_hours,
           CAST(h1 - h0 + 1 - observed AS BIGINT) AS missing_hours,
           ROUND(CAST(observed AS DOUBLE) / (h1 - h0 + 1), 6)
             AS completeness
    FROM bounds
    """,
)
def dq_heartbeat_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat completeness: observed distinct active hours against
    the full hour grid between each stream's first and last event —
    the %-complete number an ingestion SLA reports (ts_outage_windows
    lists the holes; this scores them; ts_bucket_gapfill fills them —
    the three views of the same defect). 100% = no silent hour.

    Plan: one aggregate per type combining min/max bounds and the
    distinct-hour count (two-phase distinct expand, hour-bounded);
    the expected grid is pure integer arithmetic on hour numbers —
    no spine materialization needed just to COUNT it."""
    e = table(spark, sf_dir, "events")
    hour = (F.unix_micros(F.date_trunc("hour", "ts").cast("timestamp"))
            / F.lit(3_600_000_000)).cast("long")
    bounds = e.groupBy("event_type").agg(
        F.min(hour).alias("h0"),
        F.max(hour).alias("h1"),
        F.countDistinct(hour).alias("observed"),
    )
    expected = F.col("h1") - F.col("h0") + 1
    return bounds.select(
        "event_type",
        expected.cast("long").alias("expected_hours"),
        F.col("observed").cast("long").alias("observed_hours"),
        (expected - F.col("observed")).cast("long").alias("missing_hours"),
        F.round(F.col("observed").cast("double") / expected, 6)
        .alias("completeness"),
    )


@query(
    "dq_volume_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), mom AS (
      SELECT event_type,
             CAST(CAST(SUM(CAST(c AS DECIMAL(28,0))) AS STRING) AS DOUBLE) / COUNT(*)
               AS mu,
             SQRT(GREATEST(
               CAST(CAST(SUM(CAST(c*c AS DECIMAL(38,0))) AS STRING) AS DOUBLE) / COUNT(*)
               - POWER(CAST(CAST(SUM(CAST(c AS DECIMAL(28,0))) AS STRING) AS DOUBLE)
                       / COUNT(*), 2), 1e-12)) AS sd
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.day, CAST(d.c AS BIGINT) AS n_events,
           ROUND((d.c - m.mu) / m.sd, 4) AS z
    FROM daily d JOIN mom m ON m.event_type = d.event_type
    WHERE ABS((d.c - m.mu) / m.sd) > 2.0
    """,
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily VOLUME anomaly alerts: days whose event count sits more
    than 2 sigma from that stream's mean daily volume (2, not
    the value-alert 3: volume baselines are tight, and a missed
    volume drop costs more than a false page) — the single
    most-fired data-quality alert in production (a broken producer
    or a double-ship shows up in row counts before any value-level
    check trips; ts_anomaly_zscore watches VALUES, this watches
    COUNTS — a pipeline needs both). Output is the alert table
    itself: one row per (stream, bad day).

    Plan: daily count agg, per-type moments broadcast back onto the
    day spine, a filter to the rare alerts. Count moments through
    DECIMAL; variance floored identically."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
    ).agg(F.count("*").alias("c"))
    mu = (F.sum(F.col("c").cast("decimal(28,0)")).cast("double")
          / F.count("*"))
    m2 = (F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
          .cast("double") / F.count("*"))
    mom = daily.groupBy("event_type").agg(
        mu.alias("mu"),
        F.sqrt(F.greatest(m2 - mu * mu, F.lit(1e-12))).alias("sd"),
    )
    z = (F.col("c") - F.col("mu")) / F.col("sd")
    return (
        daily.join(F.broadcast(mom), "event_type")
        .filter(F.abs(z) > 2.0)
        .select("event_type", "day",
                F.col("c").cast("long").alias("n_events"),
                F.round(z, 4).alias("z"))
    )


@query(
    "dq_label_consistency",
    oracle="""
    WITH checked AS (
      SELECT lang,
             regexp_matches(text, '[一-鿿]') AS has_cjk
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (
             WHERE (lang = 'zh') <> has_cjk) AS BIGINT) AS n_conflicts,
           ROUND(CAST(COUNT(*) FILTER (WHERE (lang = 'zh') <> has_cjk)
                      AS DOUBLE) / COUNT(*), 6) AS conflict_rate
    FROM checked GROUP BY lang
    """,
)
def dq_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection by script consistency: a doc labeled
    'zh' should contain CJK codepoints and a doc labeled anything
    else shouldn't — per-language conflict rates against that
    (the CJK range is spelled as literal codepoints: DuckDB's RE2
    build rejects backslash-u escapes while Spark's Java regex
    accepts them —
    literals parse identically in both)
    invariant. Label noise is the quality ceiling of every
    classifier trained downstream (ml_langid_confusion measures the
    MODEL against labels; this measures the LABELS against physics),
    and script-vs-label is the cheapest strong check a multilingual
    corpus has.

    Plan: one map-side unicode-class regex (identical range syntax
    both engines) + a per-language agg. At 100 TB this is the
    canonical cheap full-corpus audit: one scan, no shuffle beyond
    the language-bounded agg."""
    d = table(spark, sf_dir, "documents")
    has_cjk = F.col("text").rlike("[一-鿿]")
    conflict = (F.col("lang") == "zh") != has_cjk
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_if(conflict).cast("long").alias("n_conflicts"),
        F.round(F.count_if(conflict).cast("double") / F.count("*"), 6)
        .alias("conflict_rate"),
    )


_FANOUT_ALERT = 5  # keys multiplying a join by more than this get flagged


@query(
    "dq_join_fanout",
    oracle=f"""
    WITH mult AS (
      SELECT o.o_orderkey, COUNT(l.l_orderkey) AS m
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    )
    SELECT CAST(m AS BIGINT) AS multiplicity,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(m) AS BIGINT) AS rows_produced,
           (m > {_FANOUT_ALERT}) AS above_alert,
           ROUND(CAST(SUM(m) AS DOUBLE)
                 / SUM(SUM(m)) OVER (), 6) AS share_of_output
    FROM mult GROUP BY m
    """,
)
def dq_join_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-FANOUT AUDIT — the dq check for the quietest pipeline
    killer: a join whose right side multiplies rows (duplicate or
    unexpectedly-dense keys) inflates every downstream aggregate
    while remaining perfectly 'correct' SQL. Profiles the orders ⋈
    lineitem multiplicity DISTRIBUTION: for each fan-out m, how many
    keys produce it, how many output rows they account for, and
    whether m exceeds the alert bar ({_FANOUT_ALERT}) — the histogram
    a platform team pins in CI so a key-cardinality regression (a new
    duplicate-writing producer, a bad backfill) fails loudly before
    it silently doubles revenue metrics. The LEFT join keeps
    zero-match keys (m = 0): fan-IN loss is the symmetric failure.

    Scale: the multiplicity table is one shuffle keyed by the join
    key (the same shuffle the audited join would do); the histogram
    agg is bounded by max multiplicity, and the output share runs as
    a window over that tiny histogram."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    mult = (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("m"))
    )
    hist = mult.groupBy("m").agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("m").cast("long").alias("rows_produced"),
    )
    w = Window.partitionBy()
    return hist.select(
        F.col("m").cast("long").alias("multiplicity"),
        "n_keys",
        "rows_produced",
        (F.col("m") > _FANOUT_ALERT).alias("above_alert"),
        F.round(
            F.col("rows_produced").cast("double")
            / F.sum("rows_produced").over(w), 6
        ).alias("share_of_output"),
    )


_L_DIV = 2  # every class must exhibit at least this many sensitive values


@query(
    "privacy_l_diversity",
    oracle=f"""
    WITH tagged AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 'debt'
                  WHEN c_acctbal < 5000 THEN 'low'
                  ELSE 'high' END AS sens
      FROM customer
    ), classes AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*) AS n,
             COUNT(DISTINCT sens) AS l_distinct,
             MAX(cnt_top) AS top_sens_n
      FROM (
        SELECT c_nationkey, c_mktsegment, sens,
               COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment,
                                           sens) AS cnt_top
        FROM tagged
      ) GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(n AS BIGINT) AS n,
           CAST(l_distinct AS BIGINT) AS l_distinct,
           (l_distinct < {_L_DIV}) AS homogeneous_risk,
           ROUND(CAST(top_sens_n AS DOUBLE) / n, 6) AS top_sens_share
    FROM classes
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY audit — the attack k-anonymity misses: a class can
    hold k≥{_L_DIV} members and still leak if they all share one
    SENSITIVE value (the homogeneity attack: knowing someone is in
    the class reveals their attribute without identifying their row).
    For each (nation, segment) quasi-identifier class — the same
    classes privacy_k_anonymity sizes — counts the distinct sensitive
    values (account-balance band) and the dominant value's share;
    classes with fewer than l={_L_DIV} distinct values are flagged.
    Together the two audits gate a data release: k bounds
    re-identification, l bounds attribute disclosure.

    Scale: the distinct-count and the dominant-share both ride the
    (class, sens) key — one hash agg whose exchange is bounded by
    classes × bands, schema-sized at any corpus; the window over that
    tiny table is free."""
    c = table(spark, sf_dir, "customer")
    sens = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    tagged = c.select("c_nationkey", "c_mktsegment", sens.alias("sens"))
    cells = tagged.groupBy("c_nationkey", "c_mktsegment", "sens").agg(
        F.count("*").alias("cnt")
    )
    return cells.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count("*").cast("long").alias("l_distinct"),
        (F.count("*") < _L_DIV).alias("homogeneous_risk"),
        F.round(
            F.max("cnt").cast("double") / F.sum("cnt"), 6
        ).alias("top_sens_share"),
    )


@query(
    "dq_table_diff",
    oracle="""
    WITH restated AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 50.0
                  ELSE c_acctbal END AS c_acctbal,
             CASE WHEN c_custkey % 13 = 0 THEN 'MACHINERY'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 17 != 0
    ), joined AS (
      SELECT a.c_custkey AS a_key, r.c_custkey AS b_key,
             CASE
               WHEN r.c_custkey IS NULL THEN 'removed'
               WHEN a.c_acctbal = r.c_acctbal
                AND a.c_mktsegment = r.c_mktsegment THEN 'unchanged'
               ELSE 'modified' END AS status,
             CAST(a.c_acctbal != r.c_acctbal AS INT) AS d_bal,
             CAST(a.c_mktsegment != r.c_mktsegment AS INT) AS d_seg
      FROM customer a LEFT JOIN restated r ON r.c_custkey = a.c_custkey
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(COALESCE(d_bal, 0)) AS BIGINT) AS n_bal_changed,
           CAST(SUM(COALESCE(d_seg, 0)) AS BIGINT) AS n_seg_changed
    FROM joined GROUP BY status
    """,
)
def dq_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE DIFF / RECONCILIATION — the migration-validation
    primitive: after a restatement, an engine swap, or a backfill,
    diff the new table against the old ON THE PRIMARY KEY and report
    per-status row counts plus per-COLUMN change counts ('modified: 97
    rows, 97 of them in acctbal, 0 in segment' localizes the bug in
    one read — a plain except/subtract only says 'something differs').
    The 'new' side here is a derived restatement (arithmetic gates:
    some rows dropped, some balances bumped, some segments remapped)
    so the oracle predicts every cell of the diff exactly.

    Scale: ONE key-keyed join (the sides co-partition on the pk —
    bucketed storage makes it zero-shuffle, join_bucketed's plan) and
    a status-bounded agg. Column comparisons are map-side; adding
    columns grows the select list, not the shuffle count. The
    removed/modified/unchanged partition plus per-column counters is
    the exact contract of data-diff tools (datafold-style) — here it
    is one query."""
    c = table(spark, sf_dir, "customer")
    restated = (
        c.filter(F.col("c_custkey") % 17 != 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 11 == 0,
                   F.col("c_acctbal") + 50.0)
            .otherwise(F.col("c_acctbal")).alias("c_acctbal"),
            F.when(F.col("c_custkey") % 13 == 0, F.lit("MACHINERY"))
            .otherwise(F.col("c_mktsegment")).alias("c_mktsegment"),
        )
    )
    a, r = c.alias("a"), restated.alias("r")
    joined = a.join(r, F.col("a.c_custkey") == F.col("r.c_custkey"),
                    "left").select(
        F.when(F.col("r.c_custkey").isNull(), "removed")
        .when(
            (F.col("a.c_acctbal") == F.col("r.c_acctbal"))
            & (F.col("a.c_mktsegment") == F.col("r.c_mktsegment")),
            "unchanged",
        )
        .otherwise("modified").alias("status"),
        (F.col("a.c_acctbal") != F.col("r.c_acctbal")).cast("int")
        .alias("d_bal"),
        (F.col("a.c_mktsegment") != F.col("r.c_mktsegment")).cast("int")
        .alias("d_seg"),
    )
    return joined.groupBy("status").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.coalesce(F.col("d_bal"), F.lit(0))).cast("long")
        .alias("n_bal_changed"),
        F.sum(F.coalesce(F.col("d_seg"), F.lit(0))).cast("long")
        .alias("n_seg_changed"),
    )


@query(
    "dq_sequence_gaps",
    oracle="""
    WITH feed AS (
      -- the driver corpus's keyspace is dense; the %97/%89 drop gates
      -- stand in for upstream loss so the gap logic has real holes
      SELECT o_orderkey FROM orders
      WHERE o_orderkey % 97 != 0 AND o_orderkey % 89 != 0
    ), s AS (
      SELECT o_orderkey AS k,
             LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
      FROM feed
    )
    SELECT k + 1 AS gap_start, nxt - 1 AS gap_end,
           CAST(nxt - k - 1 AS BIGINT) AS n_missing
    FROM s WHERE nxt - k > 1
    """,
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE-GAP detection on a monotone key — the missing-data
    report an ingestion pipeline runs against upstream-assigned ids
    (kafka offsets, invoice numbers, auto-increments): every maximal
    missing RANGE [gap_start, gap_end] with its size, computed from
    one LEAD over the key order — not a calendar-spine anti-join
    (which needs the id universe materialized; at 10^12 ids the
    spine IS the problem) and not N self-joins.  Downstream of this
    report: re-request the ranges, or pin the loss against the
    producer's retention window (dq_freshness's temporal cousin, on
    the KEY axis).

    Scale: the LEAD runs per shard via the split-window rewrite
    (functions/splitwin.py): deterministic equal-width shards over
    the key, one parallel hash exchange, shard seams patched from a
    shard-count-sized boundary pass — never a single-task global
    sort. Gap output is bounded by the number of HOLES, not ids."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") % 97 != 0) & (F.col("o_orderkey") % 89 != 0)
    )
    s = split_window(
        o.select(F.col("o_orderkey").alias("k")),
        ["k"],
        lead={"nxt": "k"},
    )
    return s.filter(F.col("nxt") - F.col("k") > 1).select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col("k") - 1).cast("long").alias("n_missing"),
    )


@query(
    "dq_format_profile",
    oracle="""
    WITH masked AS (
      SELECT 'c_name' AS col,
             regexp_replace(regexp_replace(regexp_replace(
               c_name, '[0-9]', '9', 'g'), '[a-z]', 'a', 'g'),
               '[A-Z]', 'A', 'g') AS mask
      FROM customer
      UNION ALL
      SELECT 'c_mktsegment' AS col,
             regexp_replace(regexp_replace(regexp_replace(
               c_mktsegment, '[0-9]', '9', 'g'), '[a-z]', 'a', 'g'),
               '[A-Z]', 'A', 'g') AS mask
      FROM customer
    )
    SELECT col, mask,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY col), 6) AS share
    FROM masked GROUP BY col, mask
    """,
)
def dq_format_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-FORMAT PROFILING — the pattern-mask census every DQ tool
    runs before writing validation rules: fold each value to its
    SHAPE (digits→9, lowercase→a, uppercase→A; literals survive) and
    count the masks per column. One dominant mask = the de-facto
    format contract; the long tail = the rows that will break a
    parser ('Aaaaaaaa#999999999' at 99.8% tells you both the rule
    and the exceptions in a single read — a regex you'd otherwise
    guess). Runs on the name and segment columns; the mask alphabet
    extends per type without changing the plan.

    Exactness: three chained global regexp_replace passes with
    identical RE2-and-Java-safe classes on both engines; counts
    exact; the share window runs over the mask-bounded profile.

    Scale: map-side masking + a (col, mask)-keyed agg — mask
    cardinality is format-bounded (a healthy column has a handful),
    so the exchange is tiny regardless of row count; profiling N
    columns stacks N scans-worth of masks into the same shape (or
    one pass with a stack/unpivot)."""
    c = table(spark, sf_dir, "customer")

    def mask(col: str):
        m = F.regexp_replace(F.col(col), "[0-9]", "9")
        m = F.regexp_replace(m, "[a-z]", "a")
        return F.regexp_replace(m, "[A-Z]", "A")

    masked = c.select(
        F.lit("c_name").alias("col"), mask("c_name").alias("mask")
    ).unionByName(
        c.select(
            F.lit("c_mktsegment").alias("col"),
            mask("c_mktsegment").alias("mask"),
        )
    )
    w = Window.partitionBy("col")
    return (
        masked.groupBy("col", "mask")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "col", "mask", "n",
            F.round(
                F.col("n").cast("double") / F.sum("n").over(w), 6
            ).alias("share"),
        )
    )


@query(
    "dq_cross_field_consistency",
    oracle="""
    WITH joined AS (
      SELECT l.l_orderkey, l.l_shipdate, o.o_orderdate,
             l.l_quantity, l.l_extendedprice, l.l_discount
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT 'ship_before_order' AS rule,
           CAST(COUNT(*) FILTER (WHERE l_shipdate < o_orderdate)
                AS BIGINT) AS n_violations,
           CAST(COUNT(*) AS BIGINT) AS n_checked
    FROM joined
    UNION ALL
    SELECT 'nonpositive_quantity' AS rule,
           CAST(COUNT(*) FILTER (WHERE l_quantity <= 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM joined
    UNION ALL
    SELECT 'discount_out_of_band' AS rule,
           CAST(COUNT(*) FILTER (WHERE l_discount < 0
                                    OR l_discount > 0.5) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM joined
    UNION ALL
    SELECT 'price_quantity_mismatch' AS rule,
           CAST(COUNT(*) FILTER (WHERE l_extendedprice <= 0
                                   AND l_quantity > 0) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM joined
    """,
)
def dq_cross_field_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-FIELD consistency rules — the DQ category dq_checks'
    single-column audits (nulls, domains, referential) can't see:
    a row can pass every per-column check and still be IMPOSSIBLE
    as a business fact (shipped before it was ordered, priced at
    zero for positive quantity). Four rules spanning two tables:
    temporal ordering (ship ≥ order date — requires the join),
    sign (quantity > 0), band (discount ∈ [0, 0.5]), and
    implication (quantity > 0 ⇒ price > 0). One row per rule with
    violation and checked counts — the CI contract table: any
    n_violations > 0 fails the build.

    Scale: ONE fact-fact join (the same key shuffle the downstream
    queries pay anyway) feeds all rules as conditional counts in a
    single pass — rules share the scan, never one-join-per-rule;
    adding a rule adds a count_if column, not a stage. The joined
    CTE evaluates once per rule-block on the oracle side but the
    Spark plan computes all four from one cached exchange."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_shipdate", "o_orderdate", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    agg = j.agg(
        F.count("*").alias("n"),
        F.count_if(F.col("l_shipdate") < F.col("o_orderdate"))
        .alias("v_ship"),
        F.count_if(F.col("l_quantity") <= 0).alias("v_qty"),
        F.count_if((F.col("l_discount") < 0) | (F.col("l_discount") > 0.5))
        .alias("v_disc"),
        F.count_if((F.col("l_extendedprice") <= 0)
                   & (F.col("l_quantity") > 0)).alias("v_price"),
    )
    rules = [
        ("ship_before_order", "v_ship"),
        ("nonpositive_quantity", "v_qty"),
        ("discount_out_of_band", "v_disc"),
        ("price_quantity_mismatch", "v_price"),
    ]
    out = None
    for name, colname in rules:
        row = agg.select(
            F.lit(name).alias("rule"),
            F.col(colname).cast("long").alias("n_violations"),
            F.col("n").cast("long").alias("n_checked"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "dq_partition_checksums",
    oracle="""
    WITH rows_h AS (
      SELECT c_nationkey,
             md5(CAST(c_custkey AS VARCHAR) || '|' || c_name || '|'
                 || c_mktsegment) AS h
      FROM customer
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           md5(string_agg(h, '' ORDER BY h)) AS content_md5
    FROM rows_h GROUP BY c_nationkey
    """,
)
def dq_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-PARTITION CONTENT CHECKSUMS — the replication/migration
    verifier that makes dq_table_diff affordable: after copying a
    table across regions or engines, compare one ~33-byte checksum
    per partition instead of re-reading both sides; only partitions
    whose checksums disagree get the row-level diff. The checksum is
    md5 over the SORTED per-row md5s — row order, file order and
    partitioning cannot affect it (content-addressed, the same
    engine-independence trick as the oracle harness itself), and
    this very query hash-matching DuckDB is a live cross-engine
    replication check.

    Scale: row hashing is map-side; per-partition the sorted
    aggregation is the honest cost (bounded by partition size — the
    same bound partition-pruned queries already rely on). An
    incremental variant folds row hashes with XOR instead (order-
    free, mergeable, updatable) at the price of weaker collision
    behavior — stated here as the knob."""
    c = table(spark, sf_dir, "customer")
    h = F.md5(
        F.concat_ws(
            "|",
            F.col("c_custkey").cast("string"),
            F.col("c_name"),
            F.col("c_mktsegment"),
        ).cast("binary")
    )
    rows_h = c.select("c_nationkey", h.alias("h"))
    return rows_h.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.md5(
            F.concat_ws("", F.array_sort(F.collect_list("h")))
            .cast("binary")
        ).alias("content_md5"),
    )


@query(
    "dq_referential_orphans",
    oracle="""
    SELECT rel, n_child, n_orphan FROM (
      SELECT 'lineitem->orders' AS rel, COUNT(*) AS n_child,
             COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS n_orphan
      FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
      UNION ALL
      SELECT 'lineitem->part', COUNT(*),
             COUNT(*) FILTER (WHERE p.p_partkey IS NULL)
      FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
      UNION ALL
      SELECT 'lineitem->supplier', COUNT(*),
             COUNT(*) FILTER (WHERE s.s_suppkey IS NULL)
      FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
      UNION ALL
      SELECT 'orders->customer', COUNT(*),
             COUNT(*) FILTER (WHERE c.c_custkey IS NULL)
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
      UNION ALL
      SELECT 'customer->nation', COUNT(*),
             COUNT(*) FILTER (WHERE n.n_nationkey IS NULL)
      FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
      UNION ALL
      SELECT 'supplier->nation', COUNT(*),
             COUNT(*) FILTER (WHERE n.n_nationkey IS NULL)
      FROM supplier s LEFT JOIN nation n ON n.n_nationkey = s.s_nationkey)
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for every foreign-key relationship
    in the star schema, the child row count and how many children
    point at a missing parent — the orphan census a lakehouse CI gate
    runs after every restatement (dq_cross_field_consistency audits
    value rules; this audits the JOIN GRAPH itself, the failure that
    silently drops rows from every downstream inner join).

    Scale: each relationship is one left join + conditional count —
    the dimension sides broadcast, the two fact-fact checks
    (lineitem->orders) shuffle on the join key with map-side partial
    counts; the result is six rows regardless of corpus size.  A
    production run would check against the parent's KEY PROJECTION
    only (column pruning reaches the scan)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")

    def audit(child, ckey, parent, pkey, rel):
        pk = parent.select(F.col(pkey).alias("__pk")).distinct()
        return (
            child.select(F.col(ckey).alias("__ck"))
            .join(pk, F.col("__ck") == F.col("__pk"), "left")
            .agg(
                F.lit(rel).alias("rel"),
                F.count(F.lit(1)).cast("long").alias("n_child"),
                F.count(F.when(F.col("__pk").isNull(), 1)).cast("long")
                .alias("n_orphan"),
            )
            .select("rel", "n_child", "n_orphan")
        )

    return (
        audit(li, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionAll(audit(li, "l_partkey", p, "p_partkey", "lineitem->part"))
        .unionAll(
            audit(li, "l_suppkey", s, "s_suppkey", "lineitem->supplier")
        )
        .unionAll(audit(o, "o_custkey", c, "c_custkey", "orders->customer"))
        .unionAll(
            audit(c, "c_nationkey", n, "n_nationkey", "customer->nation")
        )
        .unionAll(
            audit(s, "s_nationkey", n, "n_nationkey", "supplier->nation")
        )
    )


# --- functional-dependency discovery ----------------------------------------
# Candidate FDs profiled (determinant -> dependent), chosen to span
# true, nearly-true, and false dependencies on the synthetic corpus.
_FD_PAIRS = [
    ("l_orderkey", "l_returnflag"),    # false: lines of one order differ
    ("l_partkey", "l_linestatus"),     # false-ish: parts recur across lines
    ("l_orderkey", "l_orderkey % 3"),  # true by construction
]


@query(
    "dq_functional_dependency",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{det} -> {dep}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           (SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0) AS holds
    FROM (SELECT {det} AS k, COUNT(DISTINCT {dep}) AS ndep
          FROM lineitem GROUP BY 1)"""
        for det, dep in _FD_PAIRS
    ),
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNCTIONAL-DEPENDENCY PROFILING (the Metanome/data-profiling
    primitive behind key discovery, normalization advice, and silent
    denormalization-drift alarms): for each candidate FD det -> dep,
    count determinant keys whose dependent takes MORE THAN ONE
    distinct value — zero violators means the dependency HOLDS and
    the dependent is redundant under the determinant (a join you can
    drop, a column you can factor out); violators on a dependency the
    schema claims to hold are corruption.  Three candidates span
    true-by-construction, recurring, and false dependencies so both
    verdicts are exercised at every scale.

    Scale: each candidate is one (key, COUNT DISTINCT dep) hash agg
    (map-side partial) over a 2-column pruned scan, then a
    group-rows-bounded verdict agg — the same shape ANALYZE uses, so
    FD profiling rides the stats pass at 100 TB rather than costing
    its own."""
    li = table(spark, sf_dir, "lineitem")
    out = None
    for det, dep in _FD_PAIRS:
        keys = (
            li.groupBy(F.expr(det).alias("k"))
            .agg(F.countDistinct(F.expr(dep)).alias("ndep"))
        )
        part = keys.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.when(F.col("ndep") > 1, 1).otherwise(0)).cast("long")
            .alias("n_violating"),
        ).select(
            F.lit(f"{det} -> {dep}").alias("fd"), "n_keys", "n_violating",
            (F.col("n_violating") == 0).alias("holds"),
        )
        out = part if out is None else out.unionByName(part)
    return out
