"""Composite multi-operator queries (TPC-H classic shapes): the
"whole-engine" tests — scan + filter + multi-join + agg + sort +
limit composed in one plan, the way real workloads use the operator
inventory. Catalyst sees a single declarative tree and can reorder /
push down / broadcast across family boundaries.

Scale notes per query are inline. The common theme: selective filters
run first (pushed to the parquet scan), joins orient fact-probes-dim
(AQE picks broadcast when the dim side measures small), and top-k
never materializes a global sort (TakeOrderedAndProject — per
partition k, then merge-k on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import dec, dsum, sql_dsum
from ..registry import query
from ..tables import table

def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-15'
      AND l.l_shipdate  > TIMESTAMP '1997-06-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): revenue of not-yet-shipped
    lineitems for BUILDING-segment orders placed before the cutoff.
    Both date filters push into the parquet scans; the segment-
    filtered customer⋈orders side shrinks to a dim and lineitem
    probes it; LIMIT 10 under a total order plans as
    TakeOrderedAndProject (per-partition top-10, no global sort).
    The (revenue DESC, orderkey) order is total, so the LIMIT is
    deterministic for the oracle hash."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-15").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-15").cast("timestamp_ntz")
    )
    dims = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    return (
        li.join(dims, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_revenue(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): revenue lost to
    returns per customer over one quarter, top 20. Same fact-probes-
    dim orientation; the returnflag filter prunes lineitem at the
    scan (PushedFilters), nation broadcasts unconditionally."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    dims = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("o_orderkey", "c_custkey", "c_name", "c_acctbal", "n_name")
    )
    return (
        li.join(dims, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q18",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 55)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           {sql_dsum('l.l_quantity', 'sum_qty')}
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total
    quantity exceeds a threshold, with their customers. The HAVING
    pre-aggregate runs over lineitem ONCE and its (small) passing key
    set semi-joins back — at scale this is partial-agg + broadcast
    left-semi, never a correlated re-scan. Quantity sums go through
    DECIMAL so the threshold test and the output agree with the
    oracle bit-for-bit."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("q"))
        .filter(F.col("q") > 55)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"),
                li.l_orderkey == F.col("bk"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): revenue by nation where
    the customer and the supplier share a nation in region ASIA — the
    classic 6-table snowflake with a cross-dimension equality
    (c_nationkey = s_nationkey) that makes join ORDER matter. Plan
    shape: region⋈nation broadcasts (tiny), supplier and customer are
    dims keyed by nationkey, lineitem⋈orders is the only fact-fact
    shuffle, and the nationkey equality is applied as a residual on
    the probe side rather than a second shuffle. The final groupBy has
    ≤25 groups — partial agg collapses it map-side; the exchange moves
    one row per partition per nation."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem")
    asian_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    sup = s.join(F.broadcast(asian_nations),
                 s.s_nationkey == F.col("n_nationkey")).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    cust = c.join(F.broadcast(asian_nations.select("n_nationkey")),
                  c.c_nationkey == F.col("n_nationkey")).select(
        "c_custkey", "c_nationkey"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "tpch_q14",
    oracle="""
    SELECT CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,6)) ELSE 0 END)
           / SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,6))) AS DOUBLE) AS promo_share_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): percent of revenue from
    PROMO-type parts in a half-year window. A conditional aggregate
    ratio — both sums come out of ONE scan+join pass (no second
    subquery over lineitem). `part` broadcasts; the date filter is
    pushed to the lineitem scan; the division runs on exact DECIMAL
    partials so both engines agree bit-for-bit."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    rev = dec(_revenue(), 6)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / F.sum(rev)
            ).cast("double").alias("promo_share_pct")
        )
    )


# ---------------------------------------------------------------------
# Round-2 composites. The corpus is a slimmed TPC-H (no partsupp, no
# l_commitdate/receiptdate/shipmode, no c_phone/p_container), so each
# query keeps its reference SHAPE — the operator composition Catalyst
# must optimize — with predicates adapted to existing columns; the
# adaptation is stated per query.


@query(
    "tpch_q6",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount
                AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue change (TPC-H Q6, unmodified shape): pure
    scan+filter+global agg — the pushdown benchmark. All three
    predicates reach the parquet scan (PushedFilters); no shuffle at
    all until the single-row final agg merges partials."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q7",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
        OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY sn.n_name, cn.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): bilateral trade between two
    nations by year. The nation table joins TWICE under different
    roles (supplier's vs customer's nation) — alias hygiene plus a
    disjunctive cross-role predicate Catalyst must keep above both
    joins. Nations broadcast; the nation-pair filter then shrinks
    supplier/customer to dims; lineitem⋈orders is the only fact-fact
    edge. (Nation names adapted to the corpus's NATION_k values.)"""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    sup = s.join(F.broadcast(sn), s.s_nationkey == F.col("sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    cust = c.join(F.broadcast(cn), c.c_nationkey == F.col("cn_key")).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(sup), li.l_suppkey == F.col("s_suppkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_revenue(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT join
    with a predicate ON THE JOIN (not a post-filter — customers with
    only urgent orders must still appear with count 0), double
    aggregation. COUNT(o_orderkey) counts matches only (NULL-skipping),
    which is what keeps no-order customers at 0. (Comment-pattern
    predicate adapted to o_orderpriority.)"""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q17",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa    ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < pa.half_avg
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): the correlated
    per-part average subquery, decorrelated by hand the way Catalyst
    rewrites it — ONE grouped aggregate over lineitem joined back by
    partkey (never a re-scan per outer row). The brand filter prunes
    `part` to a broadcast dim. (p_container predicate dropped — column
    absent from the corpus.)"""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pa = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum(dec(F.col("l_extendedprice"), 6)) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): three disjunctive
    multi-column predicate branches spanning BOTH join sides. The
    p_brand/p_size half of each branch prunes part BEFORE the join
    (Catalyst pushes the union of part-only constraints); the mixed
    part+lineitem residual evaluates post-join. One scan each side,
    one broadcast join, no fallback to a nested loop. (shipmode/
    container conjuncts dropped — columns absent.)"""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(_revenue(), "revenue"), F.count("*").alias("n_items"))
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): EXISTS over lineitem
    as a LEFT SEMI join — each order tests membership once, never
    multiplies by its matching lineitem count. The correlated
    late-shipment predicate (shipdate > orderdate + 60d) rides the
    semi-join condition. (Reference predicate l_commitdate <
    l_receiptdate adapted — columns absent.)"""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q21",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY),
    multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1),
    only_late AS (
      SELECT l_orderkey FROM late
      GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) = 1)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late
    JOIN multi     USING (l_orderkey)
    JOIN only_late USING (l_orderkey)
    JOIN supplier s ON s.s_suppkey = late.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 25
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape): the
    hardest reference pattern — EXISTS(another supplier on the order)
    AND NOT EXISTS(another LATE supplier), rewritten as two grouped
    key sets (multi-supplier orders; single-late-supplier orders)
    semi-joined against the late stream. Each derived set groups the
    fact ONCE — no correlated re-scans; at scale they're partial-agg'd
    key columns, far smaller than the fact. (Late = shipped >90d after
    order date; commit/receipt columns absent.)"""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select(F.col("l_orderkey").alias("mk"))
    )
    only_late = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") == 1)
        .select(F.col("l_orderkey").alias("ok"))
    )
    return (
        late.join(multi, late.l_orderkey == F.col("mk"), "left_semi")
        .join(only_late, late.l_orderkey == F.col("ok"), "left_semi")
        .join(s, late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


@query(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0),
    eligible AS (
      SELECT c.c_custkey, c.c_nationkey % 5 AS cntrycode, c.c_acctbal
      FROM customer c, avg_bal
      WHERE c.c_acctbal > avg_bal.ab
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'P'))
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS STRING) AS DOUBLE) AS totacctbal
    FROM eligible
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape): scalar subquery
    (average balance) broadcast as a 1-row cross join + NOT EXISTS as
    a LEFT ANTI join on orders. The anti join ships only o_custkey;
    the scalar average never re-computes per row. (cntrycode =
    nationkey % 5 stands in for the absent phone prefix; "no orders"
    adapted to "no OPEN orders" — every sf0.01 customer has some
    order, which would make the reference predicate vacuous.)"""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            (F.col("c_nationkey") % 5).alias("cntrycode"), "c_acctbal"
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec(F.col("c_acctbal"), 6)).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
