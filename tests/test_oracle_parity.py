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


# Scale-boundary regression keys: these two diverged ONLY at sf0.1
# (the full-registry sf0.001/sf0.01 sweeps were green), so the
# parametrized gate above cannot protect them.  subq_recursive_cte's
# undeduped frontier enumerated paths (~840k rows by depth 2 at sf0.1,
# tripping Spark's 1M recursion-row limit); win_dist's ROUND(x, 6)
# split from DuckDB on percent_rank fractions whose nearest double
# sits just under the .5 rounding boundary.  Pin both at the scale
# that exposed them.
_SF_BOUNDARY = "/root/testdata/sf0.1"


@pytest.mark.parametrize("name", ["subq_recursive_cte", "win_dist"])
def test_scale_boundary_keys_match_oracle_at_sf01(name, spark):
    c = duckdb_connect(_SF_BOUNDARY)
    try:
        rep = compare(spark, REGISTRY[name], _SF_BOUNDARY, c)
    finally:
        c.close()
    assert rep["ok"], rep.get("why", rep)
