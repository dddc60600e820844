"""Scans: parquet source with projection/predicate pushdown.

Reference parity: the reference's only 'scan' is the Pub/Sub pull loop
(/root/reference/pubsub_pipeline.py:195-211); the relational scan
surface is the mandated target (SURVEY.md §2B). Scale notes: both
queries compile to a single columnar parquet scan; the projection and
the shipdate range predicate reach the scan node (ReadSchema /
PushedFilters), so at 100 TB only the referenced columns and row
groups passing min/max pruning are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "scan_parquet",
    oracle="SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full columnar scan of a table."""
    return table(spark, sf_dir, "part")


@query(
    "scan_projection_pushdown",
    oracle="""
    SELECT l_orderkey, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1995-07-01'
    """,
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan: reads 3 of 11 columns and
    only row groups overlapping the shipdate range."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_quantity")
    )
