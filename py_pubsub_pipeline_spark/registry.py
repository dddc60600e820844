"""Query registry: the single source of truth for the operator inventory.

Each operator from SURVEY.md §2 registers here with
  - a Spark DataFrame builder  (spark, sf_dir) -> DataFrame
  - optionally, the ANSI-SQL oracle string DuckDB runs on the same
    parquet tables (omitted only for genuinely non-SQL-expressible ops,
    which the driver then checks rows-only).

Determinism contract for oracle-checked queries (driver compares
row-count + schema + order-insensitive value-hash):
  * alias every computed column identically on both sides;
  * round floating aggregates (ROUND(x, N)) on both sides so
    accumulation-order ulp noise can't flip the hash;
  * no LIMIT without a total order that is unique;
  * double->integer casts: explicit FLOOR on both sides (DuckDB's
    CAST(DOUBLE AS BIGINT) ROUNDS, Spark's truncates — found by
    dq_benford_digits);
  * terminating-decimal divisions (cents / int) land EXACTLY on
    round-half boundaries where the engines' tie rules disagree —
    report such metrics as exact integer units (value * 10^k integer-
    divided) instead of ROUND (found by retention_ltv_curve);
  * libm functions (LN/LOG2/EXP) differ by ulps across engines:
    quantize each per-row term through DECIMAL before any cross-row
    sum, then round the final result;
  * libm over DENSE arguments (e.g. LN of a uniform) is banned from
    released values outright — DECIMAL quantization cannot save a
    value whose argument is equidistributed near quantization
    boundaries (privacy_dp_count's round-9 red).  Precompute a ladder
    of exact DECIMAL literals rendered into both engine texts and
    select by integer comparison (functions/dp_noise.py,
    functions/blocking.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                   doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: populate REGISTRY)."""
    from . import queries  # noqa: F401  (imports submodules)

    return REGISTRY
