"""Deterministic aggregate/column expression helpers.

Floating-point SUM/AVG over a shuffled dataset is order-dependent: the
last-ulp noise from different partial-aggregation orders can flip a
ROUND() at the hash-comparison boundary. The engine therefore sums
doubles through DECIMAL(18,s) — exact, associative, order-independent —
and casts the exact result back to double. DuckDB does the identical
cast chain in the oracle, so results are bit-identical, at any
parallelism and any scale factor. (Casting one double to decimal is
deterministic per-value; only the *accumulation* needed fixing.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 6) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double column, as double."""
    return F.sum(dec(col, scale)).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """avg = exact-sum / count, evaluated in double on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, scale)).cast("double")
            / F.count(c).cast("double")).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 6) -> str:
    """The DuckDB twin of dsum().

    The decimal->double hop goes THROUGH VARCHAR: DuckDB's direct
    decimal->double cast converts the int128 unscaled value to double
    and then divides by 10^scale — two roundings, up to 1 ulp off the
    correctly-rounded result once the sum outgrows double's 15.95
    significant digits (first seen at sf1: an exact decimal sum of
    27864155010.941590 cast directly to 27864155010.941593 while
    Spark's BigDecimal.doubleValue — and strtod — give ...94159).
    Parsing the decimal STRING rounds once, bit-matching Spark at any
    magnitude."""
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale})))"
            f" AS STRING) AS DOUBLE) AS {alias}")


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale})))"
            f" AS STRING) AS DOUBLE)"
            f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}")
