"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (TPC-H-Q1-style pricing summary) at sf0.001.
queries()      -> every implemented operator from SURVEY.md §2 (registry).
oracle_sql()   -> the DuckDB twin for each query (None-oracle entries are
                  omitted -> driver records rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from py_pubsub_pipeline_spark.registry import load_all

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from py_pubsub_pipeline_spark.queries.aggregates import pricing_summary

    return pricing_summary(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checked query."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
