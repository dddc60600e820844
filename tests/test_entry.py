"""Driver-contract consistency: the tiered enumeration in
__spark_entry__ must stay a clean partition of the registry as keys
are added (a typo'd or forgotten tier entry silently reorders what a
capped driver run records).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402


def test_tier_sets_are_registry_subsets():
    names = set(load_all())
    assert entry._DRIVER_RECORDED <= names, entry._DRIVER_RECORDED - names
    assert entry._R3_NEW <= names, entry._R3_NEW - names
    assert not (entry._DRIVER_RECORDED & entry._R3_NEW)


def test_every_new_key_is_tiered():
    # Every key registered this round must be listed in _R3_NEW: an
    # unlisted new key lands in tier 1 and displaces a rounds-1-2
    # backlog key from a capped driver run.  Tier 1 is therefore
    # exactly the 52 keys owed a driver record from rounds 1-2.
    names = set(load_all())
    tier1 = {
        n for n in names
        if n not in entry._DRIVER_RECORDED and n not in entry._R3_NEW
    }
    assert len(tier1) == 52, (
        f"tier 1 must be exactly the 52 rounds-1-2 keys owed driver "
        f"records, got {len(tier1)} — add new keys to _R3_NEW"
    )


def test_enumeration_orders_tiers_and_covers_registry():
    names = list(entry.queries())
    specs = load_all()
    assert set(names) == set(specs)
    t1_end = 52
    t2_end = t1_end + len(entry._R3_NEW)
    assert all(n not in entry._DRIVER_RECORDED and n not in entry._R3_NEW
               for n in names[:t1_end])
    assert all(n in entry._R3_NEW for n in names[t1_end:t2_end])
    assert all(n in entry._DRIVER_RECORDED for n in names[t2_end:])


def test_oracle_sql_matches_queries_keys():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    missing = [n for n in qs if n not in osql]
    # every registered query currently carries an oracle; keep it so
    assert not missing, f"queries without oracle: {missing}"
