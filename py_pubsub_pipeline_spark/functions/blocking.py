"""Corpus-adaptive sign-prefix blocking (the SemDeDup / blocked-kNN family).

Sign-bucket blocking keys the candidate equi-join on the sign pattern
of an embedding's leading dimensions.  A FIXED prefix width is
quadratic at scale: in-block pairs grow as N^2 / 2^bits, so the width
must widen with the corpus — each added bit quarters the expected
in-block pair count.  This module derives the width from the corpus
row count with ONE integer rule, rendered identically into the Spark
plan and the DuckDB oracle so the two engines can never disagree:

    bits = smallest b in [MIN_BITS, MAX_BITS] with  n <= TARGET << b

(pure integer comparisons — no log2 float that could round differently
across engines).  TARGET is the expected block population the rule
holds constant: blocks ~TARGET rows => in-block pair work ~N*TARGET/2,
LINEAR in the corpus.  On the driver corpus: sf<=0.1 -> 4 bits
(unchanged from the certified fixed-width behavior), sf1 (20k vectors)
-> 6 bits, sf10 (200k) -> 9 bits (~49M in-block pairs, measured on the
replicated corpus — oracle-feasible, vs 1.26e9 at a fixed 4 bits).

The count reaches the plan as an UNCORRELATED SCALAR SUBQUERY on both
engines — Spark executes it as a one-row pre-job and folds the result
into the main plan as a literal (no join operator appears; the bucket
equi-join plan gates keep holding), exactly how DuckDB treats
`(SELECT bits FROM ...)`.  At 100 TB the count comes from table
statistics for free; the subquery is the engine-portable spelling.

Recall contract: widening the prefix trades recall at sign boundaries
(the standard blocked-ANN contract).  `scripts/signprefix_recall.py`
measures in-block neighbor recall vs the exact corpus truth at the
fixed and adaptive widths; SCALE.md records the curve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIGN_MIN_BITS = 4      # the certified small-corpus width
SIGN_MAX_BITS = 16     # cap (embedding dim is 64; 2^16 blocks suffice
                       # for ~3e7 rows/partition-task at TARGET=512)
SIGN_TARGET_BLOCK = 512  # expected block population the rule holds


def _ladder() -> list[tuple[int, int]]:
    """(threshold, bits) pairs: bits b applies when n <= TARGET << b."""
    return [
        (SIGN_TARGET_BLOCK << b, b)
        for b in range(SIGN_MIN_BITS, SIGN_MAX_BITS)
    ]


def sql_adaptive_bits(table_expr: str) -> str:
    """Scalar-subquery SQL computing the adaptive width (both engines)."""
    cases = " ".join(f"WHEN n <= {t} THEN {b}" for t, b in _ladder())
    return (
        f"(SELECT CASE {cases} ELSE {SIGN_MAX_BITS} END "
        f"FROM (SELECT COUNT(*) AS n FROM {table_expr}) AS _cnt)"
    )


def sql_sign_prefix(col: str, bits_sql: str) -> str:
    """DuckDB: the leading-`bits` sign pattern of an array column."""
    full = " || ".join(
        f"CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END"
        for i in range(SIGN_MAX_BITS)
    )
    return f"SUBSTR({full}, 1, {bits_sql})"


def spark_sign_prefix(col: str, spark_bits_sql: str) -> Column:
    """Spark: same leading-`bits` sign pattern, same SUBSTR semantics.

    `spark_bits_sql` is the Spark-side scalar subquery text (from
    `sql_adaptive_bits` over a `parquet.`-backed table expr); both
    SUBSTR calls are 1-based with identical length handling.
    """
    full = F.concat(
        *[
            F.when(F.element_at(col, i + 1) >= 0, F.lit("1"))
            .otherwise(F.lit("0"))
            for i in range(SIGN_MAX_BITS)
        ]
    )
    return full.substr(F.lit(1), F.expr(spark_bits_sql))


def adaptive_bits_value(n: int) -> int:
    """The same rule as plain Python (audits / tests)."""
    for t, b in _ladder():
        if n <= t:
            return b
    return SIGN_MAX_BITS
