"""The primary correctness gate, run locally: every registered query
with an oracle must hash-match DuckDB on the same parquet (the driver
runs the identical check at sf0.01; here we use sf0.001 for speed).
"""

from __future__ import annotations

import pytest

from py_pubsub_pipeline_spark.oracle import compare, duckdb_connect
from py_pubsub_pipeline_spark.registry import load_all

from conftest import SF_SMALL

REGISTRY = load_all()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, con):
    rep = compare(spark, REGISTRY[name], SF_SMALL, con)
    assert rep["ok"], rep.get("why", rep)


def test_registry_nonempty():
    assert len(REGISTRY) >= 17


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())
