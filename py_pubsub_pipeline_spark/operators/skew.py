"""Skew mitigation: salting for joins and aggregations.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in
session.py) handles most skew at runtime by splitting oversized
partitions. Salting is the *static* tool for the cases AQE can't fix:
a single hot key inside one partition of a shuffled join, or a
hot-key hash aggregation where one reducer receives the whole key.
Both transforms below are semantics-preserving — the salt only changes
HOW rows distribute, never WHAT the join/agg computes — so their
queries() entries are oracle-checked against the plain SQL.

Determinism: the salt is pmod(xxhash64(salt_from_cols), n_salts) — a
pure function of row content, not rand(), so retried tasks land rows
in the same salt bucket (required for exactly-once under task retry;
rand() salting breaks recomputation determinism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(n))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    n_salts: int = 8,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `large` has hot keys: large rows scatter over
    n_salts sub-keys; `small` replicates n_salts-fold (explode of a
    literal range — cost n_salts * |small|, the price of the cure).
    Each hot key's rows now spread over n_salts reducers instead of
    one. Output == plain large.join(small, large_key == small_key) for
    how in {'inner', 'left', 'left_semi', 'left_anti'}: those preserve
    each `large` row's match set under small-side replication, because
    a large row carries exactly one salt and meets exactly one replica
    of each matching small row. 'right'/'full' would emit every
    UNMATCHED small row once per replica (n_salts null-padded copies),
    so they are rejected rather than silently wrong.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "leftsemi",
               "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join does not preserve {how!r} semantics: unmatched "
            f"small-side rows would duplicate n_salts times; use plain "
            f"join (AQE skew handling) for right/full outer joins"
        )
    # The salt must vary WITHIN a hot key, so it can never derive from
    # the join key alone — default: hash the whole row.
    salt_cols = salt_from if salt_from is not None else list(large.columns)
    big = large.withColumn("__salt", _salt(salt_cols, n_salts))
    rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big.join(
        rep,
        (big[large_key] == rep[small_key]) & (big["__salt"] == rep["__salt"]),
        how,
    )
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 8,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation for hot grouping keys: stage 1 groups by
    (key, salt) — the hot key's rows combine on n_salts reducers in
    parallel — stage 2 merges the n_salts partials per key. `aggs`
    must be decomposable with `final_aggs` as their merge (sum/sum,
    count/sum, min/min, max/max...). Spark's own partial aggregation
    combines within input partitions; salting additionally splits the
    *reduce* side, which partial agg alone cannot."""
    # Same constraint as salted_join: the salt must split rows of one
    # hot key, so it defaults to the whole row, never the keys.
    salt_cols = salt_from if salt_from is not None else list(df.columns)
    stage1 = (
        df.withColumn("__salt", _salt(salt_cols, n_salts))
        .groupBy(*keys, "__salt")
        .agg(*aggs)
    )
    return stage1.groupBy(*keys).agg(*final_aggs).drop("__salt")
