"""Driver-contract consistency: the tiered enumeration in
__spark_entry__ must stay a clean partition of the registry as records
land (a typo'd or forgotten tier entry silently reorders what a capped
driver run records).

Counts are DERIVED from the tier sets, never hardcoded (the round-3
lesson: a literal 52 drifted stale the moment a key was registered
without updating the constant).

Round 5 froze the registry at 375: the enumeration is now just
(priority backlog, remaining backlog in registry order, recorded
greens) — the backlog drains as CORRECTNESS artifacts land.
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
    assert set(entry._PRIORITY) <= names, set(entry._PRIORITY) - names
    assert len(set(entry._PRIORITY)) == len(entry._PRIORITY)


def test_registry_size_is_intentional():
    # Round-5 froze the registry at 375; round 8 grew it to 400
    # (RAG/corpus-construction waves), round 9 to 410 (the corpus
    # governance + serving-breadth wave), round 10 to 421 (lakehouse
    # snapshot ops + DP-release completion + the PQ family + local-DP
    # randomized response + commit-log replay, SURVEY.md §2C round-10
    # row), round 11 to 424 (the two DP decomposition diagnostics for
    # the driver-red adjudication + sim_ivfpq, SURVEY.md §2C round-11
    # row).  This stays a tripwire: bump it ONLY alongside a SURVEY.md
    # row documenting the new operators.  Round 11 grew it 424 -> 444
    # across nine waves (SURVEY.md §2C round-11 rows): wave 2 +6
    # (privacy_dp_quantile, rag_maxsim, sim_range_search,
    # mix_doremi_step, scan_minmax_skipping, layout_overlap_depth),
    # wave 3 +4 (join_dpp_partition_pruned, scan_partition_evolution,
    # privacy_dp_user_count, emb_abtt), wave 4 +2
    # (scan_equality_deletes, join_spatial_grid), wave 5 +2
    # (sim_lsh_multiprobe, ml_bpe_apply), wave 6 +1
    # (agg_hll_registers), wave 7 +2 (scan_bucket_pruning,
    # ts_token_bucket_meter), wave 8 +2 (privacy_dp_topk,
    # dq_functional_dependency), wave 9 +1 (rag_prf_expansion).
    # Three keys drafted this round were REMOVED before recording as
    # near-duplicates found by docstring sweep (agg_count_min_sketch
    # ~ agg_countmin_topk, scan_column_stats ~ profile_stats,
    # ts_max_drawdown ~ win_max_drawdown) — the tripwire's job.
    # Round 12 shrank it 444 -> 442: the two temporary DP decomposition
    # diagnostics (privacy_dp_count_parts, privacy_dp_mean_parts) were
    # retired per their own drop-once-green contract after r11 greened
    # the main keys (VERDICT r11 item 2); then grew it to 446 with
    # sim_ivfpq_trained (VERDICT r11 item 5), sim_ivfpq_rescore (the
    # IVFPQR refine ladder end), scan_mor_snapshot (the MorUpsertSink
    # read path, item 6), and privacy_dp_gaussian_count (the Gaussian
    # mechanism, completing the DP mechanism pair) — SURVEY.md §2C
    # round-12 row.  Round 13 adds scan_mor_compacted (the MoR
    # compaction read path, VERDICT r12 item 5) and
    # sim_ivfpq_mp_rescore (IVF multi-probe + scaled exact refine,
    # item 7), privacy_dp_accountant (the composed zCDP/basic
    # privacy-budget ledger, item 8), and sim_ivfpq_streamed (search
    # over a stream-maintained index, IvfpqIndexSink), and
    # sim_ivfpq_trained_mp (all ANN levers composed — the measured
    # non-monotonic crossover documented as an operator): 451.
    # Round 14 adds sim_ivfpq_stream_compacted (search over the
    # streamed index after small-file compaction + vacuum — the
    # IvfpqIndexSink maintenance path, VERDICT r13 item 1) and
    # sim_knn_graph_search (HNSW/NSG-style layered graph-traversal
    # ANN, item 5; ml_bpe_apply also upgraded in place to the real
    # iterative merge loop, item 6): 453.  The round-14 build then
    # added the exact set-similarity-join family and its governance
    # consumers (SCALE.md round-14 rows): dedup_prefix_filter
    # (AllPairs prefix-filtered join, WWW'07), dedup_ppjoin (PPJoin
    # positional filter), split_leakage_safe (component-hash split
    # with a computed cross-split-pair audit), and dedup_cc_star
    # (large-star/small-star CC promoted to a certified operator):
    # 457.
    assert len(load_all()) == 457


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


def test_enumeration_orders_tiers_and_covers_registry():
    names = list(entry.queries())
    specs = load_all()
    assert set(names) == set(specs)
    prio = [n for n in entry._PRIORITY if n not in entry._DRIVER_RECORDED]
    backlog_n = len(set(specs) - entry._DRIVER_RECORDED)
    # priority keys lead, verbatim and in order
    assert names[:len(prio)] == prio
    # then the rest of the backlog, then only recorded greens
    assert all(n not in entry._DRIVER_RECORDED
               for n in names[:backlog_n])
    assert all(n in entry._DRIVER_RECORDED for n in names[backlog_n:])


def test_oracle_sql_matches_queries_keys():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    missing = [n for n in qs if n not in osql]
    # every registered query currently carries an oracle; keep it so
    assert not missing, f"queries without oracle: {missing}"
