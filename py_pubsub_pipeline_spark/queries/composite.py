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
