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
    assert entry._R1_GREEN <= names, entry._R1_GREEN - names
    assert entry._R2_NEW <= names, entry._R2_NEW - names
    assert not (entry._R1_GREEN & entry._R2_NEW)


def test_every_new_key_is_tiered():
    # Every key that postdates round 1 must be listed in _R2_NEW:
    # an unlisted new key lands in tier 1 and displaces an
    # r1-unrecorded key from a capped driver run.
    names = set(load_all())
    r1_names = entry._R1_GREEN | {
        # the 50 r1-judge-verified keys + agg_approx (r1 err row)
        n for n in names if n not in entry._R1_GREEN and n not in entry._R2_NEW
    }
    tier1 = r1_names - entry._R1_GREEN
    assert len(tier1) == 51, (
        f"tier 1 must be exactly the 51 r1 keys owed driver records, "
        f"got {len(tier1)} — add new keys to _R2_NEW"
    )


def test_enumeration_orders_tiers_and_covers_registry():
    names = list(entry.queries())
    specs = load_all()
    assert set(names) == set(specs)
    t1_end = 51
    t2_end = t1_end + len(entry._R2_NEW)
    assert all(n not in entry._R1_GREEN and n not in entry._R2_NEW
               for n in names[:t1_end])
    assert all(n in entry._R2_NEW for n in names[t1_end:t2_end])
    assert all(n in entry._R1_GREEN for n in names[t2_end:])


def test_oracle_sql_matches_queries_keys():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    missing = [n for n in qs if n not in osql]
    # every registered query currently carries an oracle; keep it so
    assert not missing, f"queries without oracle: {missing}"
