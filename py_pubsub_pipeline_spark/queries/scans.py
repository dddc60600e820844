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


# ANALYZE-style per-column stats: (column, expression-to-BIGINT) pairs.
# l_extendedprice reports exact integer cents so every stat is BIGINT.
_STATS_COLS = [
    ("l_orderkey", "l_orderkey"),
    ("l_partkey", "l_partkey"),
    ("l_suppkey", "l_suppkey"),
    ("l_quantity", "CAST(l_quantity AS BIGINT)"),
    # FLOOR(+0.5) rule from registry.py: CAST(DOUBLE AS BIGINT) rounds
    # in DuckDB but truncates in Spark — price*100 is within one ulp
    # of an integer, so half-up through FLOOR is engine-exact.
    ("l_extendedprice_cents",
     "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"),
]


@query(
    "scan_column_stats",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS column_name, COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT({expr}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS ndv,
           CAST(MIN({expr}) AS BIGINT) AS min_v,
           CAST(MAX({expr}) AS BIGINT) AS max_v
    FROM lineitem"""
        for name, expr in _STATS_COLS
    ),
)
def scan_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE — the CBO stats-collection pass every engine runs
    before planning big joins: per column, row count, null count,
    exact NDV, min and max, as one row per column (the shape of
    ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` /
    ``pg_stats``).  These are the numbers that drive broadcast-vs-
    shuffle decisions, join reordering, and the zone-map bounds
    scan_minmax_skipping prunes with.

    Shape: ONE wide aggregate over a single scan — min/max/counts are
    plain partial aggs; the exact NDVs expand per distinct column
    (Spark's multi-distinct Expand), which is the correct small-scale
    oracle-checkable form.  At 100 TB the production variant swaps
    COUNT(DISTINCT) for approx_count_distinct (HLL, one pass, no
    Expand) — same plan otherwise; exact NDV here is what lets DuckDB
    certify the identity.  The wide row unpivots to one row per
    column via stack() on the 1-row result (driver-free)."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for name, expr in _STATS_COLS:
        aggs += [
            F.expr(f"COUNT(*) - COUNT({expr})").alias(f"{name}__nulls"),
            F.expr(f"COUNT(DISTINCT {expr})").alias(f"{name}__ndv"),
            F.expr(f"CAST(MIN({expr}) AS BIGINT)").alias(f"{name}__min"),
            F.expr(f"CAST(MAX({expr}) AS BIGINT)").alias(f"{name}__max"),
        ]
    wide = li.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack = ", ".join(
        f"'{name}', {name}__nulls, {name}__ndv, {name}__min, {name}__max"
        for name, _ in _STATS_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_STATS_COLS)}, {stack})"
            " AS (column_name, n_nulls, ndv, min_v, max_v)"
        ),
        "n_rows",
    ).select(
        "column_name", "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("ndv").cast("long").alias("ndv"), "min_v", "max_v",
    )
