"""Sorts, limits/top-k, and set operations.

The order-insensitive hash can't see row order, so sort queries
materialize their order as a ROW_NUMBER column — that makes the sort
observable to the correctness gate. Null ordering is explicit on both
sides (Spark defaults NULLS FIRST for ASC; DuckDB defaults NULLS LAST).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.splitwin import split_window
from ..registry import query
from ..tables import table


@query(
    "sort_multi",
    oracle="""
    SELECT p_partkey, p_brand, sz,
           ROW_NUMBER() OVER (ORDER BY sz DESC NULLS LAST,
                              p_brand ASC NULLS FIRST,
                              p_partkey ASC) AS pos
    FROM (SELECT p_partkey, p_brand, NULLIF(p_size, 25) AS sz FROM part)
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit nulls placement, materialized as a
    global position column via the split-window rewrite
    (functions/splitwin.py): deterministic size shards (nulls mirror
    Spark's desc_nulls_last into the final shard), parallel per-shard
    numbering, shard-count-sized offset pass — never the
    single-partition window the first four rounds carried here."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.nullif(F.col("p_size"), F.lit(25)).alias("sz")
    )
    return split_window(
        p,
        [F.col("sz").desc_nulls_last(),
         F.col("p_brand").asc_nulls_first(),
         F.col("p_partkey").asc()],
        bucket="sz",
        descending=True,
        row_number="pos",
    ).select("p_partkey", "p_brand", "sz", "pos")


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — each partition
    keeps its local top 10, the driver merges; no global sort, no full
    shuffle, O(k) memory. The unique tie-break key makes the result
    set deterministic."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_name AS name, c_acctbal AS bal, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_name AS name, s_acctbal AS bal, 'supplier' AS kind FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.lit("customer").alias("kind"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("bal"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT (dedup = hash agg on the union)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct anti set-difference)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)


@query(
    "set_union_byname",
    oracle="""
    SELECT o_orderkey AS key, o_totalprice AS amount, o_orderpriority AS priority
    FROM orders WHERE o_orderkey < 500
    UNION ALL BY NAME
    SELECT o_orderkey AS key, o_totalprice AS amount
    FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1000
    """,
)
def set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: the second input lacks a column (the
    everyday shape when a corpus adds metadata mid-collection);
    unionByName(allowMissingColumns=True) aligns by NAME and
    null-pads — positional unionAll would silently mis-bind columns.
    Map-side concatenation of scans, no shuffle. Oracle: DuckDB's
    UNION ALL BY NAME, the identical semantics."""
    o = table(spark, sf_dir, "orders")
    wide = o.filter(F.col("o_orderkey") < 500).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderpriority").alias("priority"),
    )
    narrow = o.filter(
        (F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 1000)
    ).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("amount"),
    )
    return wide.unionByName(narrow, allowMissingColumns=True)
