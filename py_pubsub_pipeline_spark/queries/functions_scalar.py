"""Scalar function library: string, date/time, math, array, JSON/map,
casts. All JVM-side built-ins (whole-stage codegen) — no Python UDFs.

Cross-engine cast gotchas handled here:
- double -> int: Spark truncates, DuckDB rounds -> go through FLOOR;
- ceil/floor: Spark returns LONG, DuckDB DOUBLE -> cast both to BIGINT;
- ln/log: libm last-ulp differences -> ROUND(x, 6);
- timestamp -> string: explicit format (date_format vs strftime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS up_name,
           LOWER(c_mktsegment) AS lo_seg,
           SUBSTRING(c_name, 10, 5) AS name_mid,
           LENGTH(c_name) AS name_len,
           CONCAT_WS('-', c_mktsegment, c_name) AS seg_name,
           REPLACE(c_name, 'Customer#', 'C') AS short_name,
           LPAD(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
           TRIM(CONCAT(' ', c_name, ' ')) AS trimmed,
           split_part(c_name, '#', 2) AS name_num
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C")).alias("short_name"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS y,
           CAST(MONTH(o_orderdate) AS INTEGER) AS m,
           CAST(DAY(o_orderdate) AS INTEGER) AS d,
           CAST(QUARTER(o_orderdate) AS INTEGER) AS q,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_95,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction, truncation, arithmetic, formatting."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        # DuckDB's date_trunc('month') yields DATE; align Spark's TIMESTAMP
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_95"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_disc_gap,
           CAST(CEIL(l_quantity)  AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           POWER(l_quantity, 2) AS qty_sq,
           ROUND(LN(l_extendedprice), 6) AS ln_price,
           ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
           l_orderkey % 7 AS key_mod
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_gap"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(list_sum(CAST(embedding[1:8] AS DOUBLE[])) AS DOUBLE) AS head_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           CAST(embedding[1] AS DOUBLE) AS first_val
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over the embedding column (size/slice/filter/fold).
    head_sum folds sequentially in both engines -> bit-identical."""
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.aggregate(
            F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("head_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.col("embedding").getItem(0).cast("double").alias("first_val"),
    )


@query(
    "fn_map_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           LENGTH(props) AS props_len
    FROM events
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + typed access (the props column is the
    reference's dynamic-JSON payload shape, SURVEY.md §1.1)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.length("props").alias("props_len"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR) AS price_str,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor_int,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST('3.25' AS DOUBLE) AS lit_double,
           CAST('2024-06-01 12:30:00' AS TIMESTAMP) AS lit_ts,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM orders WHERE o_orderkey < 3000
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family: double<->decimal<->string, string->timestamp.
    double->int goes through FLOOR (Spark truncates, DuckDB rounds)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(14,2)").cast("string").alias("price_str"),
        F.floor("o_totalprice").cast("long").alias("price_floor_int"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.lit("3.25").cast("double").alias("lit_double"),
        F.lit("2024-06-01 12:30:00").cast("timestamp_ntz").alias("lit_ts"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


@query(
    "fn_misc",
    oracle="""
    SELECT s_suppkey,
           COALESCE(NULLIF(s_name, 'Supplier#1'), 'anon') AS name_or_anon,
           GREATEST(s_acctbal, 0.0) AS bal_floor,
           LEAST(CAST(s_nationkey AS BIGINT), s_suppkey) AS min_key,
           CASE WHEN s_acctbal < 0 THEN 'debt' ELSE 'ok' END AS standing
    FROM supplier
    """,
)
def fn_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling and variadic comparison scalars: NULLIF/COALESCE
    round-trip, GREATEST/LEAST, conditional classification."""
    s = table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.coalesce(
            F.nullif(F.col("s_name"), F.lit("Supplier#1")), F.lit("anon")
        ).alias("name_or_anon"),
        F.greatest("s_acctbal", F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("s_nationkey").cast("bigint"), F.col("s_suppkey")).alias(
            "min_key"
        ),
        F.when(F.col("s_acctbal") < 0, "debt").otherwise("ok").alias("standing"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 170) AS toggled,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family: AND/OR/XOR and shifts — the primitives
    under bitmap indexes, bloom-filter membership, and hash mixing.
    Pure codegen'd JVM expressions; the filter prunes at the scan."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(170)).alias("toggled"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
    )


@query(
    "fn_try",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
           ROUND(o_totalprice / NULLIF(o_orderkey % 3, 0), 6) AS per_mod,
           TRY_CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 3) AS BIGINT)
             AS price_head
    FROM orders
    """,
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_* error-safe expressions — the engine's permissive-typing
    posture (SURVEY §1.1: the reference has no schema system, bad data
    must degrade to NULL, never kill a 100 TB job): try_cast on
    non-numeric strings, try_divide absorbing division by zero. Each
    maps to a plain NULL-producing expression in ANSI SQL, so the
    oracle is exact."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 3), 6
        ).alias("per_mod"),
        F.substring(F.col("o_totalprice").cast("string"), 1, 3)
        .try_cast("bigint")
        .alias("price_head"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion (Spark 4): parse the JSON props column ONCE
    into the binary VARIANT encoding, then extract typed fields with
    variant_get path expressions — the semi-structured story that
    replaces per-access get_json_object re-parsing (fn_map_json's
    shape): parse cost is paid once per row, every subsequent path
    access is a binary traversal.  The oracle reads the same numbers
    through DuckDB's JSON extraction, so a variant encode/decode bug
    surfaces as a value mismatch.

    Scale: parse_json + variant_get are codegen'd column expressions
    (one scan, no Python); at 100 TB the VARIANT column is what you
    PERSIST (shredded parquet), so the parse happens at ingest, not
    per query."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "fn_xml",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
             AS sum_price,
           MIN(o_orderkey) AS min_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML column pipeline (Spark 4 from_xml): serialize each order
    row into an XML fragment, parse it back with an explicit schema,
    and aggregate the RECOVERED fields — the oracle computes the same
    aggregates from the original columns, so the hash certifies the
    XML encode+parse roundtrip (element order, numeric text, escaping)
    rather than trusting the parser.  This is the synthesize->decode->
    verify pattern the multimodal codecs use, applied to the one
    ingest format the format matrix (parquet/JSONL/CSV/ORC) lacked.

    Scale: both directions are map-side column expressions; XML is an
    ingest boundary format — parse at the edge with an explicit
    schema, persist columnar (same engine policy as CSV/JSONL)."""
    o = table(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"), F.col("o_totalprice").cast("string"),
        F.lit("</p><s>"), F.col("o_orderstatus"), F.lit("</s></o>"),
    )
    parsed = o.select(
        F.from_xml(xml, "k BIGINT, p DOUBLE, s STRING").alias("x")
    )
    return (
        parsed.select("x.k", "x.p", "x.s")
        .groupBy(F.col("s").alias("status"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("p").cast("decimal(18,6)")).cast("double")
            .alias("sum_price"),
            F.min("k").alias("min_key"),
        )
    )


@query(
    "fn_collate",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg2,
             c_acctbal
      FROM customer)
    SELECT lower(seg2) AS seg,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS sum_bal
    FROM mixed GROUP BY lower(seg2)
    """,
)
def fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): group a deliberately case-mangled
    segment column under the UTF8_LCASE collation, so 'BUILDING' and
    'building' land in ONE group without rewriting the data through
    lower() — collation-aware comparison is the engine-level form of
    case-insensitive semantics (it also drives joins, ORDER BY, and
    DISTINCT; lower()-wrapping only fixes equality and loses the
    original bytes).  The output key is lower(representative), which
    is identical regardless of which case variant the engine kept, so
    the hash is deterministic; the oracle is the classic lower()
    rewrite.

    Scale: collation-aware grouping hashes collation keys directly —
    one hash agg, no derived-column materialization."""
    c = table(spark, sf_dir, "customer")
    mixed = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment")).alias("seg2"),
        "c_acctbal",
    )
    return (
        mixed.groupBy(F.expr("collate(seg2, 'UTF8_LCASE')").alias("segc"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            .alias("sum_bal"),
        )
        .select(
            F.lower(F.col("segc").cast("string")).alias("seg"), "n", "sum_bal"
        )
    )


@query(
    "fn_business_days",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS prio,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS a,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               AS b
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), bd AS (
      -- bd(x) = weekdays in [epoch..x]: 5 per full week + the partial
      -- week, with weekday (x+3)%7 mapping Monday->0 (1970-01-01 was
      -- a Thursday -> 3). Pure integer math — no engine weekday enum.
      SELECT prio,
             (5 * (b // 7) + LEAST((b + 3) % 7 + 1, 5))
             - (5 * (a // 7) + LEAST((a + 3) % 7 + 1, 5)) AS bdays
      FROM d
    )
    SELECT prio,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(bdays) AS BIGINT) AS min_bdays,
           CAST(MAX(bdays) AS BIGINT) AS max_bdays,
           ROUND(CAST(CAST(SUM(CAST(bdays AS DECIMAL(28,0))) AS STRING) AS DOUBLE)
                 / COUNT(*), 6) AS avg_bdays
    FROM bd GROUP BY prio
    """,
)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day lead time (order -> ship, weekends excluded) per
    priority class, via the closed-form weekday-prefix count
    bd(x) = 5*(x div 7) + min(weekday(x)+1, 5) on EPOCH-DAY integers
    with weekday = (x+3) % 7 — deliberately avoiding both engines'
    dayofweek() functions, whose Sunday-origin conventions differ
    (Spark: Sunday=1; DuckDB: Sunday=0). SLA dashboards live on this
    number, and a naive calendar datediff overstates lead time ~40%.

    Plan: the whole computation is map-side integer arithmetic inside
    the join projection (codegen'd), then a 5-group hash agg; exact
    DECIMAL sum for the average."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-01").cast("date")

    def bd(col):
        x = F.datediff(F.col(col).cast("date"), epoch)
        return 5 * F.floor(x / 7) + F.least((x + 3) % 7 + 1, F.lit(5))

    d = o.join(li, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("prio"),
        (bd("l_shipdate") - bd("o_orderdate")).alias("bdays"),
    )
    return d.groupBy("prio").agg(
        F.count("*").cast("long").alias("n"),
        F.min("bdays").cast("long").alias("min_bdays"),
        F.max("bdays").cast("long").alias("max_bdays"),
        F.round(F.sum(F.col("bdays").cast("decimal(28,0)")).cast("double")
                / F.count("*"), 6).alias("avg_bdays"),
    )


@query(
    "fn_calendar_spine",
    oracle="""
    WITH spine AS (
      SELECT CAST(UNNEST(generate_series(DATE '1995-01-01',
                                         DATE '1995-12-31',
                                         INTERVAL 1 DAY)) AS DATE) AS d
    )
    SELECT CAST(month(d) AS INT) AS mo,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(COUNT(*) FILTER (
             WHERE (date_diff('day', DATE '1970-01-01', d) + 3) % 7 < 5)
             AS BIGINT) AS n_weekdays,
           MIN(d) AS first_day, MAX(d) AS last_day,
           CAST(MIN(CASE WHEN (date_diff('day', DATE '1970-01-01', d) + 3)
                              % 7 = 0 THEN d END) AS DATE)
             AS first_monday
    FROM spine GROUP BY month(d)
    """,
)
def fn_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar spine: a full year of dates materialized
    from NOTHING (sequence/generate_series — no source table), with
    per-month day counts, weekday counts, and first Mondays — the
    dbt-style date dimension every gapfill/cohort/seasonal op in
    this repo implicitly joins against, surfaced as its own
    oracle-checked operator. Weekday math reuses fn_business_days'
    epoch-day formula (engine dayofweek() origins differ — pinned
    the same way).

    Plan: the spine is generated map-side (365 rows from one
    sequence expression), then a 12-group agg — a date dimension for
    N years is ~365N rows, broadcastable at any N a calendar can
    reach."""
    spine = spark.range(1).select(
        F.explode(F.sequence(
            F.lit("1995-01-01").cast("date"),
            F.lit("1995-12-31").cast("date"),
            F.expr("INTERVAL 1 DAY"))).alias("d"))
    epoch = F.lit("1970-01-01").cast("date")
    wd = (F.datediff(F.col("d"), epoch) + 3) % 7
    return spine.groupBy(F.month("d").cast("int").alias("mo")).agg(
        F.count("*").cast("long").alias("n_days"),
        F.count_if(wd < 5).cast("long").alias("n_weekdays"),
        F.min("d").alias("first_day"),
        F.max("d").alias("last_day"),
        F.min(F.when(wd == 0, F.col("d"))).cast("date")
        .alias("first_monday"),
    )


@query(
    "fn_rounding_mode_audit",
    oracle="""
    WITH r AS (
      SELECT o_totalprice AS v,
             -- both modes built portably from FLOOR — never the
             -- engines' ROUND, whose tie rules differ
             FLOOR(o_totalprice * 10 + 0.5) / 10 AS half_up,
             CASE
               WHEN o_totalprice * 10 - FLOOR(o_totalprice * 10) = 0.5
               THEN (CASE WHEN CAST(FLOOR(o_totalprice * 10) AS BIGINT)
                               % 2 = 0
                          THEN FLOOR(o_totalprice * 10)
                          ELSE FLOOR(o_totalprice * 10) + 1 END) / 10
               ELSE FLOOR(o_totalprice * 10 + 0.5) / 10 END AS half_even
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE half_up <> half_even) AS BIGINT)
             AS n_divergent,
           ROUND(CAST(CAST(SUM(CAST(half_up - half_even AS DECIMAL(18,6))) AS STRING) AS DOUBLE), 4) AS cumulative_bias
    FROM r
    """,
)
def fn_rounding_mode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode audit: round order values to one decimal under
    HALF-UP and HALF-EVEN (banker's) rules — both constructed from
    FLOOR so neither engine's own ROUND tie rule leaks in — and
    count where they diverge plus the cumulative bias half-up
    accumulates (ties always round away, so money summed under
    half-up drifts upward; banker's rounding exists precisely to
    cancel it, and finance compliance audits exactly this). This
    operator institutionalizes the repo's own cross-engine footgun
    (registry.py's determinism contract) as a user-facing check.

    Plan: pure map-side arithmetic + one aggregate; the tie test
    (fraction exactly .5) is exact because 2-decimal money times 10
    is representable. Bias sums through DECIMAL."""
    o = table(spark, sf_dir, "orders")
    v10 = F.col("o_totalprice") * 10
    half_up = F.floor(v10 + 0.5) / 10
    is_tie = (v10 - F.floor(v10)) == 0.5
    fl = F.floor(v10)
    half_even = F.when(
        is_tie,
        F.when(fl.cast("long") % 2 == 0, fl).otherwise(fl + 1) / 10
    ).otherwise(half_up)
    r = o.select(half_up.alias("hu"), half_even.alias("he"))
    return r.agg(
        F.count("*").cast("long").alias("n"),
        F.count_if(F.col("hu") != F.col("he")).cast("long")
        .alias("n_divergent"),
        F.round(F.sum((F.col("hu") - F.col("he")).cast("decimal(18,6)"))
                .cast("double"), 4).alias("cumulative_bias"),
    )


# --- geo distance ---------------------------------------------------------
# Deterministic synthetic coordinates derived from c_custkey (the corpus
# carries no geo columns): lat in (-90, 90), lon in (-180, 180). Both
# engines derive them with identical integer arithmetic, so the geometry
# is exactly shared.
_DEG2RAD = 0.017453292519943295  # math.pi / 180, one literal both engines
_EARTH_KM = 6371.0088            # IUGG mean radius
_ANCHOR_LAT = 52.52              # the fixed probe point (Berlin)
_ANCHOR_LON = 13.405
_GEO_TOP = 20


@query(
    "fn_geo_haversine",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 180 AS DOUBLE) - 90.0 + 0.5 AS lat,
             CAST((c_custkey * 7) % 360 AS DOUBLE) - 180.0 + 0.5 AS lon
      FROM customer
    ), d AS (
      SELECT c_custkey, lat, lon,
             2.0 * {_EARTH_KM} * asin(sqrt(
               sin((lat - {_ANCHOR_LAT}) * {_DEG2RAD} / 2.0)
                 * sin((lat - {_ANCHOR_LAT}) * {_DEG2RAD} / 2.0)
               + cos(lat * {_DEG2RAD}) * cos({_ANCHOR_LAT} * {_DEG2RAD})
                 * sin((lon - {_ANCHOR_LON}) * {_DEG2RAD} / 2.0)
                 * sin((lon - {_ANCHOR_LON}) * {_DEG2RAD} / 2.0)
             )) AS km
      FROM pts
    )
    SELECT c_custkey, ROUND(lat, 4) AS lat, ROUND(lon, 4) AS lon,
           ROUND(km, 3) AS dist_km
    FROM d
    ORDER BY ROUND(km, 3), c_custkey
    LIMIT {_GEO_TOP}
    """,
)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance as a library function: the
    {_GEO_TOP} customers nearest a fixed anchor point, on synthetic
    per-customer coordinates derived arithmetically from the key (the
    corpus has no geo columns; the derivation is identical integer
    math on both engines, so the geometry is exactly shared). This is
    the geo-dedup / nearest-store / region-assignment primitive a log
    or POS pipeline needs.

    Cross-engine float discipline: radians come from one shared
    multiplication factor (NOT each engine's radians(), whose internal
    operation order may differ); the formula is written in the same
    IEEE operation order on both sides; the output and the ORDER BY
    both use the ROUNDED km (3 decimals ≈ 1 m) with c_custkey as the
    final tiebreak, so last-ulp libm noise in sin/cos/asin cannot
    reorder the LIMIT selection.

    Scale: pure map-side arithmetic + a global top-k
    (TakeOrderedAndProject — per-partition heaps, no full sort). A
    geo-JOIN variant would bucket both sides by geohash cell and join
    on cell, same shape as dedup's banded candidates."""
    c = table(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 180).cast("double") - 90.0 + 0.5
    lon = ((F.col("c_custkey") * 7) % 360).cast("double") - 180.0 + 0.5
    dlat_h = (lat - _ANCHOR_LAT) * _DEG2RAD / 2.0
    dlon_h = (lon - _ANCHOR_LON) * _DEG2RAD / 2.0
    km = (
        2.0 * _EARTH_KM
        * F.asin(
            F.sqrt(
                F.sin(dlat_h) * F.sin(dlat_h)
                + F.cos(lat * _DEG2RAD) * F.cos(F.lit(_ANCHOR_LAT * _DEG2RAD))
                * F.sin(dlon_h) * F.sin(dlon_h)
            )
        )
    )
    return (
        c.select(
            "c_custkey",
            F.round(lat, 4).alias("lat"),
            F.round(lon, 4).alias("lon"),
            F.round(km, 3).alias("dist_km"),
        )
        .orderBy("dist_km", "c_custkey")
        .limit(_GEO_TOP)
    )


# --- IPv4 / CIDR arithmetic ----------------------------------------------
# Synthetic per-event source IPs derived from user_id with shared integer
# arithmetic (no IP column in the corpus). The op under test is the CIDR
# machinery itself: dotted-quad formatting, /16 aggregation, block
# membership — all exact integer ops, no engine-specific inet types.
_CIDR_BLOCK_HI = 42  # the monitored block: 10.42.0.0/16


@query(
    "fn_ip_cidr",
    oracle=f"""
    WITH ips AS (
      SELECT user_id,
             167772160 + (user_id % 250) * 65536
               + ((user_id * 7) % 256) * 256 + (user_id * 13) % 256
               AS ip_int
      FROM events
    )
    SELECT CONCAT('10.', CAST((ip_int // 65536) % 256 AS VARCHAR),
                  '.0.0/16') AS subnet,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(ip_int) AS BIGINT) AS min_ip,
           CAST(MAX(ip_int) AS BIGINT) AS max_ip,
           ((ip_int // 65536) % 256 = {_CIDR_BLOCK_HI}) AS in_watch_block
    FROM ips
    GROUP BY (ip_int // 65536) % 256
    """,
)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4/CIDR arithmetic as a library surface: per-event source IPs
    (synthesized from user_id with identical integer math on both
    engines — the corpus carries no IP column) rolled up to /16
    subnets, with dotted-CIDR formatting, per-subnet event/user
    counts, the observed address range, and membership of the
    monitored 10.{_CIDR_BLOCK_HI}.0.0/16 block. This is the
    log-pipeline primitive behind abuse triage, bot-block matching
    and per-network rate analysis — done entirely in exact int64
    arithmetic (an inet type is representation, not semantics).

    Scale: one scan, map-side integer ops, one hash agg keyed by the
    /16 octet (≤ 256 groups — bounded regardless of corpus size); the
    distinct-user count is the only per-group state that grows, and
    it shuffles (octet, user_id) pairs which partial aggregation
    dedups map-side first."""
    e = table(spark, sf_dir, "events")
    uid = F.col("user_id")
    ip_int = (
        F.lit(167772160)          # 10.0.0.0
        + (uid % 250) * 65536
        + ((uid * 7) % 256) * 256
        + (uid * 13) % 256
    )
    ips = e.select("user_id", ip_int.alias("ip_int"))
    hi = (F.col("ip_int") / 65536).cast("long") % 256
    return (
        ips.groupBy(hi.alias("o2"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.min("ip_int").cast("long").alias("min_ip"),
            F.max("ip_int").cast("long").alias("max_ip"),
        )
        .select(
            F.concat(F.lit("10."), F.col("o2").cast("string"),
                     F.lit(".0.0/16")).alias("subnet"),
            "n_events",
            "n_users",
            "min_ip",
            "max_ip",
            (F.col("o2") == _CIDR_BLOCK_HI).alias("in_watch_block"),
        )
    )


# --- Luhn checksum --------------------------------------------------------
# Synthetic 16-digit PAN-shaped numbers derived from o_orderkey (the
# corpus carries no card column; the derivation is shared integer math).
_LUHN_LEN = 16


@query(
    "fn_luhn_checksum",
    oracle=f"""
    WITH cards AS (
      SELECT o_orderkey,
             lpad(CAST(o_orderkey * 37 + 11 AS VARCHAR), {_LUHN_LEN}, '0')
               AS pan
      FROM orders
    ), sums AS (
      SELECT o_orderkey, pan,
             list_sum([
               CASE WHEN ({_LUHN_LEN + 1} - i) % 2 = 0 THEN
                 CASE WHEN 2 * CAST(substring(pan, CAST(i AS INT), 1)
                                    AS INT) > 9
                      THEN 2 * CAST(substring(pan, CAST(i AS INT), 1)
                                    AS INT) - 9
                      ELSE 2 * CAST(substring(pan, CAST(i AS INT), 1)
                                    AS INT) END
               ELSE CAST(substring(pan, CAST(i AS INT), 1) AS INT) END
               FOR i IN generate_series(1, {_LUHN_LEN})
             ]) AS luhn_sum
      FROM cards
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cards,
           CAST(COUNT(*) FILTER (WHERE luhn_sum % 10 = 0) AS BIGINT)
             AS n_valid,
           CAST(COUNT(*) FILTER (WHERE luhn_sum % 10 != 0) AS BIGINT)
             AS n_invalid,
           ROUND(CAST(COUNT(*) FILTER (WHERE luhn_sum % 10 = 0)
                      AS DOUBLE) / COUNT(*), 6) AS valid_rate
    FROM sums
    """,
)
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN (mod-10) checksum validation — the missing half of PII
    detection: text_pii_redact's regexes find NUMBER-SHAPED strings,
    but 90% of 16-digit matches are order ids, not cards; the Luhn
    check is what separates a plausible PAN from noise before a
    redaction pass burns it. Validates synthetic PAN-shaped numbers
    (derived from o_orderkey with shared integer math) digit-by-digit:
    double every second digit from the right, fold >9 back by −9,
    valid iff the sum ≡ 0 (mod 10).

    Exactness: pure integer digit arithmetic on both engines — the
    per-digit fold runs as a higher-order array aggregate (Spark
    F.aggregate over sequence(1,{_LUHN_LEN}); DuckDB list
    comprehension), no floats until the one rounded rate.

    Scale: map-side arithmetic with a single global count agg — scan
    speed; in a real redaction pipeline this predicate slots between
    the regex candidate match and the masking step, cutting false
    positives at zero extra shuffles."""
    o = table(spark, sf_dir, "orders")
    pan = F.lpad((F.col("o_orderkey") * 37 + 11).cast("string"),
                 _LUHN_LEN, "0")
    cards = o.select("o_orderkey", pan.alias("pan"))
    dig = lambda i: F.substr(F.col("pan"), i, F.lit(1)).cast("int")  # noqa: E731
    luhn_sum = F.aggregate(
        F.sequence(F.lit(1), F.lit(_LUHN_LEN)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (F.lit(_LUHN_LEN + 1) - i) % 2 == 0,
            F.when(2 * dig(i) > 9, 2 * dig(i) - 9).otherwise(2 * dig(i)),
        ).otherwise(dig(i)),
    )
    sums = cards.select(luhn_sum.alias("luhn_sum"))
    valid = F.col("luhn_sum") % 10 == 0
    return sums.agg(
        F.count("*").cast("long").alias("n_cards"),
        F.count_if(valid).cast("long").alias("n_valid"),
        F.count_if(~valid).cast("long").alias("n_invalid"),
        F.round(F.count_if(valid).cast("double") / F.count("*"), 6)
        .alias("valid_rate"),
    )


@query(
    "fn_base64_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (
             WHERE from_base64(to_base64(encode(text))) = encode(text)
               AND unhex(hex(encode(text))) = encode(text)
           ) AS BIGINT) AS n_roundtrip_ok,
           md5(string_agg(to_base64(encode(text)), '' ORDER BY doc_id))
             AS b64_md5,
           CAST(SUM(length(to_base64(encode(text)))) AS BIGINT)
             AS b64_chars,
           CAST(SUM(length(hex(encode(text)))) AS BIGINT) AS hex_chars
    FROM documents GROUP BY lang
    """,
)
def fn_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY TRANSPORT CODECS — base64 and hex encode/decode, the
    boundary functions every opaque-payload pipeline leans on (the
    reference moves raw bytes through JSON-hostile channels; base64
    is how binary rides a text envelope, R5/R8's serde cousins).
    Round-trips every document through BOTH codecs and proves
    losslessness per row, then fingerprints the base64 TEXT itself —
    so the hash also pins canonical encoding (RFC 4648 alphabet, '='
    padding, no line wrapping) across engines, not just
    decodability.

    Exactness: byte-level equality and md5 over the concatenated
    encodings in doc_id order; the length sums pin the 4/3 and 2x
    expansion factors exactly.

    Scale: pure map-side string transforms + one lang-bounded agg —
    scan-speed; the string_agg fingerprint is the only
    corpus-ordered reduction and exists for the oracle hash, not the
    production shape."""
    d = table(spark, sf_dir, "documents")
    raw = F.col("text").cast("binary")
    # Spark's base64() inherits Java's MIME encoder (CRLF every 76
    # chars); strip the wrapping to the RFC 4648 canonical form DuckDB
    # emits — the hash comparison is exactly what catches this.
    b64 = F.regexp_replace(F.base64(raw), "[\r\n]", "")
    hx = F.hex(raw)
    ok = (F.unbase64(b64) == raw) & (F.unhex(hx) == raw)
    per_doc = d.select("doc_id", "lang", b64.alias("b64"),
                       hx.alias("hx"), ok.alias("ok"))
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_if(F.col("ok")).cast("long").alias("n_roundtrip_ok"),
        F.md5(
            F.concat_ws(
                "", F.array_sort(
                    F.collect_list(F.struct("doc_id", "b64"))
                ).getField("b64")
            ).cast("binary")
        ).alias("b64_md5"),
        F.sum(F.length("b64")).cast("long").alias("b64_chars"),
        F.sum(F.length("hx")).cast("long").alias("hex_chars"),
    )


# --- fiscal 4-4-5 calendar -----------------------------------------------
# Fiscal year starts at the ISO week containing Jan 1 of the dataset's
# first year; quarters are 4+4+5-week periods (13-week quarters, the
# retail standard). Week index = epoch-days DIV 7 relative to a fixed
# Monday anchor — pure integer arithmetic on both engines.
_FISCAL_ANCHOR_DAYS = 8040  # 1992-01-06 (a Monday) as days since epoch
# The anchor PRECEDES the corpus's earliest date, keeping every week
# index non-negative — integer div/mod then agree across engines
# (negative operands hit floor-vs-truncate and remainder-sign
# divergence).


@query(
    "fn_fiscal_445",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_totalprice,
             (CAST(epoch(o_orderdate) AS BIGINT) // 86400
              - {_FISCAL_ANCHOR_DAYS}) // 7 AS wk
      FROM orders
    ), tagged AS (
      SELECT o_totalprice,
             wk // 52 AS fy,
             wk % 52 AS fw,
             CASE WHEN wk % 52 < 13 THEN 1
                  WHEN wk % 52 < 26 THEN 2
                  WHEN wk % 52 < 39 THEN 3
                  ELSE 4 END AS fq,
             CASE WHEN (wk % 52) % 13 < 4 THEN 1
                  WHEN (wk % 52) % 13 < 8 THEN 2
                  ELSE 3 END AS fp
      FROM base
    )
    SELECT CAST(fy AS BIGINT) AS fiscal_year,
           CAST(fq AS BIGINT) AS fiscal_quarter,
           CAST(fp AS BIGINT) AS fiscal_period,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS STRING) AS DOUBLE)
             AS revenue
    FROM tagged GROUP BY fy, fq, fp
    """,
)
def fn_fiscal_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FISCAL 4-4-5 CALENDAR mapping — the retail/FP&A time axis the
    Gregorian functions can't produce: 13-week quarters split into
    4-, 4- and 5-week periods, so every period contains exactly the
    same weekday mix and period-over-period comparisons aren't
    polluted by how many weekends fell in a month (the reason the
    pattern exists). The mapping is pure integer arithmetic on the
    epoch-day week index from a fixed Monday anchor — no weekday
    functions (fn_business_days' lesson: engines disagree on
    dayofweek origins; epoch math never does). Revenue rolls up by
    (fiscal year, quarter, period).

    Exactness: week index, year, quarter and period are all integer
    div/mod; revenue sums in DECIMAL.

    Scale: map-side tagging + one calendar-bounded agg — the fiscal
    columns cost nothing and normally land in fn_calendar_spine's
    generated dimension for broadcast-joining everything else."""
    o = table(spark, sf_dir, "orders")
    wk = F.floor(
        (
            F.floor(
                F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
                / 86400
            )
            - _FISCAL_ANCHOR_DAYS
        )
        / 7
    )
    fw = wk % 52
    tagged = o.select(
        "o_totalprice",
        F.floor(wk / 52).alias("fy"),
        F.when(fw < 13, 1).when(fw < 26, 2).when(fw < 39, 3)
        .otherwise(4).alias("fq"),
        F.when(fw % 13 < 4, 1).when(fw % 13 < 8, 2).otherwise(3)
        .alias("fp"),
    )
    return tagged.groupBy("fy", "fq", "fp").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
        .alias("revenue"),
    ).select(
        F.col("fy").cast("long").alias("fiscal_year"),
        F.col("fq").cast("long").alias("fiscal_quarter"),
        F.col("fp").cast("long").alias("fiscal_period"),
        "n_orders", "revenue",
    )
