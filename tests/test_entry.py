"""Driver-contract consistency: the tiered enumeration in
__spark_entry__ must stay a clean partition of the registry as keys
are added (a typo'd or forgotten tier entry silently reorders what a
capped driver run records).

Counts are DERIVED from the tier sets, never hardcoded (the round-3
lesson: a literal 52 drifted stale the moment a key was registered
without updating the constant).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402

_REPO = pathlib.Path(__file__).resolve().parent.parent


def test_tier_sets_are_registry_subsets():
    names = set(load_all())
    assert entry._DRIVER_RECORDED <= names, entry._DRIVER_RECORDED - names
    assert entry._R4_NEW <= names, entry._R4_NEW - names
    assert not (entry._DRIVER_RECORDED & entry._R4_NEW)


def test_recorded_set_matches_correctness_artifacts():
    # _DRIVER_RECORDED must be exactly the union of GREEN rows in the
    # CORRECTNESS_r*.json artifacts present in the repo — derived, so
    # it can't silently drift when a round lands.
    green: set[str] = set()
    for p in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        if rnd > entry._RECORDED_THROUGH:
            # a newer artifact landed after the constants were written
            # (end-of-round driver commit); folding it in is the NEXT
            # session's first task, not a test failure now
            continue
        rows = json.loads(p.read_text())
        green |= {
            k for k, v in rows.items()
            if v.get("rows_match") and v.get("schema_match")
            and v.get("hash_match") is not False
        }
    # keys recorded green in an early round stay recorded even if a
    # later round re-records them; red rows never count.
    assert entry._DRIVER_RECORDED == green & set(load_all()), (
        sorted(entry._DRIVER_RECORDED ^ (green & set(load_all())))
    )


def test_every_new_key_is_tiered():
    # Every key not yet driver-recorded must be either in the backlog
    # (tier 1) or listed in _R4_NEW; tier 1 must shrink, never grow,
    # as rounds record keys.  The backlog is whatever the CORRECTNESS
    # artifacts haven't recorded green — derived, not hardcoded.
    names = set(load_all())
    tier1 = {
        n for n in names
        if n not in entry._DRIVER_RECORDED and n not in entry._R4_NEW
    }
    expected_tier1 = names - entry._DRIVER_RECORDED - entry._R4_NEW
    assert tier1 == expected_tier1
    # sanity: the three tiers partition the registry
    assert tier1 | entry._R4_NEW | entry._DRIVER_RECORDED == names


def test_enumeration_orders_tiers_and_covers_registry():
    names = list(entry.queries())
    specs = load_all()
    assert set(names) == set(specs)
    t1_end = len(set(specs) - entry._DRIVER_RECORDED - entry._R4_NEW)
    t2_end = t1_end + len(entry._R4_NEW)
    assert all(n not in entry._DRIVER_RECORDED and n not in entry._R4_NEW
               for n in names[:t1_end])
    assert all(n in entry._R4_NEW for n in names[t1_end:t2_end])
    assert all(n in entry._DRIVER_RECORDED for n in names[t2_end:])


def test_oracle_sql_matches_queries_keys():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    missing = [n for n in qs if n not in osql]
    # every registered query currently carries an oracle; keep it so
    assert not missing, f"queries without oracle: {missing}"
