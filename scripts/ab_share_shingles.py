#!/usr/bin/env python
"""Interleaved A/B: the two basket near-dup passes with and without
the share_shingles() cross-query materialization (round-6 verdict
task 6 — cut the sf0.1 floor where the basket repeats work).

A (default): dedup_ngram_capped + dedup_ngram_jaccard as bench.py
times them — each query tokenizes/hashes/explodes the corpus itself.

B (shared):  inside share_shingles(), the (doc_id, h) relation is
persisted once; the build is TIMED and charged to the B total, then
both queries read the cache.  This is the multi-pass curation-DAG
shape: one staged intermediate, N consumers.

Interleaved ABAB on one box state, warmup pass first, per-leg
best-of-2 inside each round.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_pubsub_pipeline_spark.queries import dedup  # noqa: E402
from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEYS = ["dedup_ngram_capped", "dedup_ngram_jaccard"]
ROUNDS = 2


def _time(fn):
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def main() -> int:
    registry = load_all()
    spark = get_spark("ab-share-shingles")

    # warmup both forms (JIT, page cache, AQE stats)
    for k in KEYS:
        registry[k].fn(spark, SF_DIR).count()
    with dedup.share_shingles(spark, SF_DIR) as sh:
        sh.count()
        for k in KEYS:
            registry[k].fn(spark, SF_DIR).count()

    a_legs, b_legs = [], []
    for _ in range(ROUNDS):
        # --- A: independent queries ---
        a_total, a_per = 0.0, {}
        for k in KEYS:
            dt, _ = _time(lambda: registry[k].fn(spark, SF_DIR).count())
            a_per[k] = round(dt, 3)
            a_total += dt
        a_legs.append({"total": round(a_total, 3), **a_per})

        # --- B: shared materialization, build charged to the total ---
        with dedup.share_shingles(spark, SF_DIR) as sh:
            build, _ = _time(lambda: sh.count())
            b_total, b_per = build, {"build": round(build, 3)}
            for k in KEYS:
                dt, _ = _time(lambda: registry[k].fn(spark, SF_DIR).count())
                b_per[k] = round(dt, 3)
                b_total += dt
        b_legs.append({"total": round(b_total, 3), **b_per})

    best_a = min(l["total"] for l in a_legs)
    best_b = min(l["total"] for l in b_legs)
    print(json.dumps({
        "metric": "dedup_pair_wall_seconds",
        "sf_dir": SF_DIR,
        "a_independent": a_legs,
        "b_shared": b_legs,
        "best_a": best_a,
        "best_b": best_b,
        "speedup": round(best_a / best_b, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
