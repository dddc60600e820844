"""Projections, predicates, null semantics, conditional expressions.

Reference parity: the reference's per-record transform is an opaque
Python callable (/root/reference/pubsub_pipeline.py:62,176-184); here
the same map-stage is expressed as Column expressions so Catalyst can
see through it (whole-stage codegen, pushdown) instead of hitting a
Python serde wall per record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection with aliases. No rounding: per-row IEEE
    arithmetic in the same evaluation order is bit-identical across
    engines (rounding would NOT be — Spark's round() goes through the
    double's shortest decimal repr, DuckDB's rounds the binary value,
    and 2-decimal source data makes .xx5 ties common)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("revenue"),
        (disc * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE (l_quantity > 45 AND l_returnflag = 'R')
       OR (l_discount < 0.02 AND l_linestatus = 'F')
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicate (AND/OR, comparison ops)."""
    li = table(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")) | (
        (F.col("l_discount") < 0.02) & (F.col("l_linestatus") == "F")
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )


@query(
    "filter_null",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS st,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS st_filled
    FROM orders
    WHERE NULLIF(o_orderstatus, 'O') IS NULL OR NULLIF(o_orderstatus, 'O') = 'F'
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued null logic: NULLIF / IS NULL / COALESCE (the corpus
    has no physical NULLs, so they are synthesized with NULLIF)."""
    o = table(spark, sf_dir, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.select(
            "o_orderkey",
            st.alias("st"),
            F.coalesce(st, F.lit("OPEN")).alias("st_filled"),
        )
        .filter(F.col("st").isNull() | (F.col("st") == "F"))
    )


@query(
    "filter_between_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND (p_name LIKE '%red%' OR p_type LIKE 'ECON%')
      AND regexp_matches(p_brand, 'Brand#1[0-9]')
    """,
)
def filter_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + LIKE + regexp predicates."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").between(10, 30)
        & (F.col("p_name").like("%red%") | F.col("p_type").like("ECON%"))
        & F.col("p_brand").rlike("Brand#1[0-9]")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'final'
                ELSE 'other' END AS status_name
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched + simple CASE expressions."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "final")
        .otherwise("other")
        .alias("status_name"),
    )
