#!/usr/bin/env python
"""sf1 bench: the evidence for the "fixed-floor" claim (VERDICT r1 #4).

Round-1 graded six headline queries `weak` because their >2x-of-DuckDB
ratios at sf0.1 were ARGUED to be Spark's constant per-query cost
(scheduling, py4j, broadcast builds) rather than plan defects. This
script puts that on the record: it materializes a 10x corpus
(~sf1, 6M lineitem rows) and times BOTH engines on the same nine
headline queries — Spark via the registry, DuckDB via each query's own
oracle SQL — writing BENCH_sf1.json with per-query ratios.

Corpus construction (same scheme as scripts/scale_probe.py):
  - fact tables replicate 10x with disjoint key spaces per replica
    (FK graph preserved within each replica);
  - documents get every word tagged per replica so cross-replica
    Jaccard is 0 — near-dup pairs grow linearly, as a real 10x corpus
    would, not quadratically as verbatim copies would;
  - embeddings replicate with vec_id offsets (probe set stays
    vec_id < 50 — fixed queries, 10x candidates: the ANN scaling);
  - events are written with ts as µs TIMESTAMP_NTZ so DuckDB reads
    the same event-time column Spark does (the driver corpus's
    TIMESTAMP(NANOS) needs the nanosAsLong dance; a derived corpus
    doesn't have to reproduce that quirk).

Run:  python scripts/bench_sf1.py          # writes BENCH_sf1.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from bench import HEADLINE  # noqa: E402

# Scale-series-only rows (VERDICT r11 item 1): the ANN ladder's IVF-PQ
# composite is priced at sf1/sf10 beside the sf0.1 basket's sim_pq_adc
# so the floor-dominated sf0.1 readings get amortization evidence.
# Round 13 adds the TRAINED composite: with the index fixtures
# persisted its serve plan is sim_ivfpq's, and the committed row is
# the evidence the r12 `weak` (189 s of per-invocation re-training at
# sf10) stays flipped — the DuckDB side re-trains per run, which is
# the documented fixture asymmetry being measured.
SERIES_EXTRA = ["sim_ivfpq", "sim_ivfpq_trained", "sim_ivfpq_mp_rescore"]
# Round 14 adds the multi-probe + scaled-refine composite: it shares
# sim_ivfpq's persisted codes fixture, so its row isolates the
# query-side probe-expansion + refine cost (VERDICT r13 item 7).
from py_pubsub_pipeline_spark.oracle import duckdb_connect  # noqa: E402
from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402
from py_pubsub_pipeline_spark.tables import TABLE_NAMES, table  # noqa: E402

BASE = "/root/testdata/sf0.1"
# MULT=10 over the sf0.1 base is the canonical sf1 artifact; override
# SPARK_GRAFT_SCALE_MULT to probe other scales (e.g. 30 -> ~sf3, the
# crossover probe) — the corpus dir, metric label, and artifact name
# all derive from it so the sf1 artifact is never clobbered.
MULT = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "10"))
SF_LABEL = f"sf{MULT / 10:g}"
OUT = f"/tmp/{SF_LABEL}"

# Bump whenever the corpus construction scheme changes.  The per-table
# "exists -> skip" rebuild cache once silently reused a corpus built
# by an OLDER scheme: round 3's "regenerated on the fixed corpus"
# artifact was in fact measured on the stale pre-fix corpus (the fix
# landed mid-round while /tmp/sf1 already existed), which overstated
# both engines' dedup times ~10x and flipped the headline ratio.  A
# version stamp makes the cache key the scheme, not the path.
CORPUS_VERSION = "v2-singleton-dims-offset-keys"

KEY_OFFSETS = {
    "o_orderkey": 10_000_000, "l_orderkey": 10_000_000,
    "o_custkey": 1_000_000, "c_custkey": 1_000_000,
    "p_partkey": 1_000_000, "l_partkey": 1_000_000,
    "s_suppkey": 100_000, "l_suppkey": 100_000,
    "event_id": 10_000_000, "user_id": 1_000_000,
    "doc_id": 1_000_000, "vec_id": 1_000_000,
}

# TPC-H semantics: nation and region do NOT scale with SF — they stay
# single-copy.  (The first cut of this script replicated them with
# un-offset keys, so every fact><dim join matched 10 identical dim
# copies — a 10x fan-out that inflated join_multiway's sf1 time ~7x
# and misread as "Spark degrades at scale".  Likewise part/supplier
# keys were not offset.  The corpus bug, not the engine, was the
# regression.)
SINGLETON = {"nation", "region"}


def _build_corpus(spark) -> None:
    import shutil

    stamp = os.path.join(OUT, "_CORPUS_VERSION")
    have = None
    if os.path.exists(stamp):
        with open(stamp) as fh:
            have = fh.read().strip()
    if have != CORPUS_VERSION:
        shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    for name in TABLE_NAMES:
        dst = f"{OUT}/{name}.parquet"
        if os.path.exists(dst):
            continue
        # events: go through table() so ts is already µs TIMESTAMP_NTZ.
        src = (
            table(spark, BASE, name)
            if name == "events"
            else spark.read.parquet(f"{BASE}/{name}.parquet")
        )
        if name in SINGLETON:
            src.write.mode("overwrite").parquet(dst)
            print(f"# built {dst} (singleton dim)", file=sys.stderr)
            continue
        parts = []
        for i in range(MULT):
            df: DataFrame = src
            for col, off in KEY_OFFSETS.items():
                if col in df.columns:
                    df = df.withColumn(col, F.col(col) + i * off)
            if name == "documents" and i > 0:
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w: F.concat(w, F.lit(f"_r{i}")),
                        ),
                        " ",
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)
        print(f"# built {dst}", file=sys.stderr)
    with open(stamp, "w") as fh:
        fh.write(CORPUS_VERSION + "\n")


def _best_of(fn, runs: int = 2) -> tuple[float, int]:
    best, n = None, 0
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def main() -> int:
    registry = load_all()
    spark = get_spark("bench_sf1")
    _build_corpus(spark)

    from bench import _plan_fingerprint  # repo-root bench.py (round 10)

    results: dict[str, dict] = {}
    for name in HEADLINE + SERIES_EXTRA:
        spec = registry[name]
        spec.fn(spark, OUT).count()  # warm (JIT, page cache, AQE stats)
        s_best, s_rows = _best_of(lambda: spec.fn(spark, OUT).count())
        results[name] = {"spark_sec": round(s_best, 3)}
        results[name]["plan_fp"] = _plan_fingerprint(
            spec.fn(spark, OUT), spark
        )
        print(f"# spark  {name}: {s_best:.3f}s ({s_rows} rows) "
              f"plan={results[name]['plan_fp']}", file=sys.stderr)

    # Fair-baseline rule: DuckDB runs each oracle in its BEST
    # completing formulation for this scale.  The registered text pins
    # the shingle CTE MATERIALIZED (the only form that finishes sf10
    # under the temp caps — the inline form re-derives the explosion
    # per reference and spilled >55 GiB there), but at sf1/sf3 the
    # INLINE form is faster; SPARK_GRAFT_ORACLE_STRIP_MAT=1 times the
    # hint-stripped text instead, and the artifact records which form
    # ran so the series rows are comparable.
    strip = os.environ.get("SPARK_GRAFT_ORACLE_STRIP_MAT") == "1"
    con = duckdb_connect(OUT)
    for name in HEADLINE + SERIES_EXTRA:
        sql = registry[name].oracle
        if strip:
            sql = sql.replace("AS MATERIALIZED (", "AS (")
        con.execute(sql).fetchall()  # warm page cache, plan cache
        d_best, _ = _best_of(lambda: len(con.execute(sql).fetchall()))
        results[name]["duckdb_sec"] = round(d_best, 3)
        results[name]["ratio"] = round(results[name]["spark_sec"] / d_best, 2)
        print(f"# duckdb {name}: {d_best:.3f}s", file=sys.stderr)
    con.close()
    oracle_form = "inline (hints stripped)" if strip else "as registered"

    total_s = round(sum(r["spark_sec"] for r in results.values()), 3)
    total_d = round(sum(r["duckdb_sec"] for r in results.values()), 3)
    doc = {
        "metric": f"headline_query_wall_seconds_{SF_LABEL}",
        "sf": MULT / 10,
        "corpus": f"{OUT} ({MULT}x replication of sf0.1, see scripts/bench_sf1.py)",
        "oracle_form": oracle_form,
        "spark_total_sec": total_s,
        "duckdb_total_sec": total_d,
        "ratio_total": round(total_s / total_d, 2),
        "queries": results,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_{SF_LABEL}.json",
    )
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(doc))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
