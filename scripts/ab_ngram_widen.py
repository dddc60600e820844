#!/usr/bin/env python
"""Same-session interleaved A/B: dedup_ngram_{capped,jaccard} with the
_hashed_shingles widen_scan ON (A, the r14 plan, fp c5346212719d /
9ecd03e1877c) vs OFF (B, the r13 plan, fp 05a9e0e51607 / 2e20747de923).

VERDICT r14 item 1: the builder's healthy-box A/B said the widen wins
15-25%; the driver's degraded-box run said it loses even
DuckDB-normalized.  Full-bench reruns are too noisy between sessions
(observed control-plan totals 7.6/15.5/10.1 s across 40 minutes on this
box), so this probe times ONLY the two keys, interleaved ABAB in one
session — identical box state for both variants, the bench's own timed
action (fresh fn() build + .count()) and shuffle width (session
default, as bench.py uses for the ngram keys).

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_ngram_widen.py [sf_dir] [rounds]

HISTORICAL NOTE: the probe settled the question on the PRE-r15 tree
(where _hashed_shingles called widen_scan, so patching widen_scan to
identity produced the B variant).  After the r15 revert
(_hashed_shingles reads the narrow scan directly), both variants
build the identical no-widen plan and the script measures A == B by
construction; to reproduce the original A/B, run it from commit
73c972b.  The measured results are quoted at the _hashed_shingles
call site and in OPTIMIZATION_r15.md item 1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import py_pubsub_pipeline_spark.queries.dedup as dd  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab_ngram_widen")
    orig_widen = dd.widen_scan

    def build(key: str, widen: bool):
        dd.widen_scan = orig_widen if widen else (lambda df, *k: df)
        try:
            fn = dd.dedup_ngram_capped if key == "capped" \
                else dd.dedup_ngram_jaccard
            return fn(spark, sf_dir)
        finally:
            dd.widen_scan = orig_widen

    # warmup both variants of both keys (bench.py's untimed warmup)
    for key in ("capped", "jaccard"):
        for widen in (True, False):
            build(key, widen).count()

    times: dict[str, list[float]] = {
        f"{k}_{v}": [] for k in ("capped", "jaccard") for v in ("A", "B")
    }
    for r in range(rounds):
        # alternate order per round so neither variant always runs first
        order = [True, False] if r % 2 == 0 else [False, True]
        for key in ("capped", "jaccard"):
            for widen in order:
                t0 = time.time()
                build(key, widen).count()
                dt = time.time() - t0
                times[f"{key}_{'A' if widen else 'B'}"].append(round(dt, 3))
    out = {}
    for k, v in sorted(times.items()):
        out[k] = {"min": min(v), "med": sorted(v)[len(v) // 2], "all": v}
        print(f"{k}: min={min(v):.3f} med={sorted(v)[len(v) // 2]:.3f} "
              f"all={v}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
