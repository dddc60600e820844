#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., "duckdb": {...}, "duckdb_total_sec": ..., "ratio_total": ...}

DUAL-ENGINE, SAME SESSION: the DuckDB side of the 2x gate is measured
in this very process right after the Spark side (same box state, same
warm page cache), so the ratio never compares against a stale number
measured under different load (the round-2 drift problem: the box
slowed ~20% between snapshots and the recorded DuckDB total predated
that — see BASELINE.md "comparability" note).

Each query is timed end-to-end (plan + execute + collect), after one
untimed warmup run to amortize JVM/session startup out of the numbers
(the driver compares per-query seconds, not cold-start). The DuckDB
oracle gets the identical warmup + best-of-2 treatment.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from py_pubsub_pipeline_spark.oracle import duckdb_connect  # noqa: E402
from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402

# Headline set: one representative per operator family, heaviest first.
# Near-dup runs BOTH forms: dedup_ngram_capped is the variant a 100 TB
# corpus can actually run (candidate pairs bounded by |shingles|·DF_CAP
# instead of quadratic in per-shingle document frequency) and
# dedup_ngram_jaccard is the uncapped exact diagnostic — keeping both
# in the basket restores round-over-round comparability after round 3
# swapped one for the other (rounds 1-2 timed jaccard, round 3 timed
# capped; round 4+ times both).
HEADLINE = [
    "agg_group",            # scan+filter+hash agg (TPC-H Q1 style)
    "join_multiway",        # 5-table join chain
    "join_broadcast",       # broadcast hash join
    "win_rank",             # window functions
    "limit_topk",           # global top-k
    "dedup_ngram_capped",   # df-capped shingle inverted-index near-dup
    "dedup_ngram_jaccard",  # uncapped exact near-dup diagnostic
    "sim_topk",             # brute-force cosine top-k (since round 5:
                            # the driver-free cogrouped tile kernel —
                            # same key, same oracle, new plan; rounds
                            # 1-4 timed the probe-collect mapInPandas
                            # form, now sim_topk_driver_baseline)
    "text_tokens",          # tokenize+explode+count
    "stream_tumbling",      # time-window agg (batch twin)
    "sim_pq_adc",           # quantized-ANN headline (round 11): PQ
                            # encode + broadcast-LUT ADC scan — the
                            # LLM-pipeline side of the engine gets a
                            # perf-tracked representative.  Round-over-
                            # round totals: r11+ include this row;
                            # compare the r10 basket via the other ten.
    "sim_ivfpq",            # the FAISS composite (round 12): IVF route
                            # + residual-PQ ADC off the persisted codes
                            # fixture.  r12+ totals include this row;
                            # compare r11 via the other eleven.
    "scan_mor_snapshot",    # lakehouse headline (round 13): merge-on-
                            # read resolution — union of per-sequence
                            # data files + ONE broadcast anti-join on
                            # the delete union (Iceberg v2's rule).
                            # r13+ totals include this row; compare r12
                            # via the other twelve.
]

# Sub-second shapes: their output (and often input) is tiny, so the
# default cores-count shuffle width is pure scheduling overhead — e.g.
# stream_tumbling reduces 600k events to ~3.4k windows; win_rank's
# final exchange carries one row per (nation, rank<=5).  For those, a
# narrow shuffle is the right plan at ANY scale factor: the width a
# real cluster would pick is sized to the post-agg data (KBs), not to
# the input.  Applied per-query via runtime conf, restored after.
SHUFFLE_WIDTH = {
    "win_rank": 8,
    "limit_topk": 8,
    "text_tokens": 8,
    "stream_tumbling": 8,
    # code rows are 4 B/vector and the output is queries x k — every
    # exchange in the PQ plan carries KBs at any corpus size
    "sim_pq_adc": 8,
    # the delete side broadcasts and the map-side-combined final agg
    # emits 7 groups — the only exchange carries a few rows per task
    "scan_mor_snapshot": 8,
}


def _plan_fingerprint(df, spark) -> str:
    """Structural hash of the executed (final-AQE) plan tree.

    Round-9 verdict item 7: BENCH rounds kept paying box-drift
    adjudication (r08->r09 +23% wall on git-identical code).  The
    fingerprint pins the plan STRUCTURE — operator sequence, codegen
    spans, join strategies, exchange count — while normalizing away
    run-varying noise (node ids, expression ids, statistics), so a
    wall-time delta with an unchanged fingerprint is self-adjudicating
    box drift, and a fingerprint change points at a real plan change.
    """
    # Materialize THIS DataFrame's queryExecution so AQE finalizes —
    # JVM-side (RDD count on the executed plan), never a collect():
    # basket outputs reach millions of rows at sf10 and a driver
    # collect for a *fingerprint* would be absurd.
    df._jdf.queryExecution().executedPlan().execute().count()
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("== Initial Plan ==")[0]
    lines = []
    for ln in tree.splitlines():
        if not ln.strip() or ln.lstrip().startswith("=="):
            continue
        ln = re.sub(r"\(\d+\)", "", ln)            # node ids
        ln = re.sub(r"Statistics\([^)]*\)", "", ln)  # AQE stage stats
        ln = re.sub(r"#\d+[A-Za-z]*", "#", ln)     # expression ids
        ln = re.sub(r"operator id: \d+", "operator id:", ln)  # ReusedExchange
        lines.append(ln.rstrip())
    return hashlib.md5("\n".join(lines).encode()).hexdigest()[:12]


def _best_of(fn, runs: int = 2):
    best, n = None, 0
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("bench")
    default_width = spark.conf.get("spark.sql.shuffle.partitions")

    # --- Spark side -----------------------------------------------------
    # Warmup: run every headline query once at the BENCH SF (untimed)
    # so the measured pass reports steady-state throughput — JIT-
    # compiled codegen, warm parquet footers/page cache, settled AQE
    # statistics — not first-call JVM compilation or cold I/O. (The
    # DuckDB side below enjoys the same warm-cache treatment.)
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is not None:
            try:
                spec.fn(spark, sf_dir).count()
            except Exception:  # noqa: BLE001
                pass

    # Best of 2 timed runs per query: the repeat rejects one-off
    # scheduler/GC hiccups so the number reflects the plan, not the
    # noise floor of a shared box.
    timings: dict[str, float] = {}
    plan_fp: dict[str, str] = {}
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None:
            continue
        width = SHUFFLE_WIDTH.get(name)
        if width is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(width))
        try:
            best, n = _best_of(lambda: spec.fn(spark, sf_dir).count())
            # untimed extra execution for the fingerprint (the timed
            # runs go through count() whose DataFrame is discarded)
            plan_fp[name] = _plan_fingerprint(spec.fn(spark, sf_dir), spark)
        finally:
            if width is not None:
                spark.conf.set("spark.sql.shuffle.partitions", default_width)
        timings[name] = round(best, 3)
        print(f"# spark  {name}: {timings[name]}s ({n} rows) "
              f"plan={plan_fp[name]}", file=sys.stderr)

    # --- DuckDB side (same process, same box state, right now) ----------
    duck: dict[str, float] = {}
    con = duckdb_connect(sf_dir)
    for name in HEADLINE:
        spec = registry.get(name)
        if spec is None or spec.oracle is None:
            continue
        sql = spec.oracle
        try:
            con.execute(sql).fetchall()  # warm page cache / plan cache
            d_best, _ = _best_of(lambda: len(con.execute(sql).fetchall()))
        except Exception as exc:  # noqa: BLE001
            print(f"# duckdb {name}: FAILED {exc}", file=sys.stderr)
            continue
        duck[name] = round(d_best, 3)
        print(f"# duckdb {name}: {duck[name]}s", file=sys.stderr)
    con.close()

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    total_s = round(sum(timings.values()), 3)
    total_d = round(sum(duck.values()), 3) if duck else None
    print(json.dumps({
        "metric": "headline_query_wall_seconds",
        "value": total_s,
        "unit": "sec",
        "queries": timings,
        "plan_fp": plan_fp,
        "sf": float(sf) if sf else None,
        "duckdb": duck,
        "duckdb_total_sec": total_d,
        "ratio_total": round(total_s / total_d, 2) if total_d else None,
        "note": "both engines timed in this process back-to-back "
                "(same box state); best-of-2 after one warmup run each",
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
