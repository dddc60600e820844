#!/usr/bin/env python
"""Scale probe: how do the headline plans behave when the corpus
grows 4x / 10x? (sf0.1 -> ~sf1 equivalent, 6M lineitem rows).

Builds replicated corpora under /tmp/scale_probe/m{K} from the driver
corpus (read-only) with content perturbed so semantics scale
linearly, not quadratically:
  - fact tables replicate with key offsets (disjoint orderkeys /
    custkeys / event ids per replica — FK graph preserved per replica);
  - documents get every WORD tagged per replica, so cross-replica
    Jaccard is 0 and near-dup pairs grow linearly (replicating
    verbatim would grow pairs quadratically — a corpus property, not
    an engine property);
  - embeddings replicate with vec_id offsets (queries stay vec_id<50).

Prints per-query seconds at each multiplier and the effective scaling
exponent log(t10/t1)/log(10). Run:  python scripts/scale_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/scale_probe"
MULTS = [1, 4, 10]
QUERIES = [
    "agg_group",
    "join_multiway",
    "win_rank",
    "dedup_ngram_jaccard",
    "sim_topk",
    "stream_tumbling",
]

KEY_OFFSETS = {
    # column -> per-replica offset (disjoint id spaces, FK-consistent)
    "o_orderkey": 10_000_000, "l_orderkey": 10_000_000,
    "o_custkey": 1_000_000, "c_custkey": 1_000_000,
    "event_id": 10_000_000, "user_id": 1_000_000,
    "doc_id": 1_000_000, "vec_id": 1_000_000,
}


def replicate(spark, name: str, mult: int, out_dir: str) -> None:
    src = spark.read.parquet(f"{BASE}/{name}.parquet")
    parts = []
    for i in range(mult):
        df: DataFrame = src
        for col, off in KEY_OFFSETS.items():
            if col in df.columns:
                df = df.withColumn(col, F.col(col) + i * off)
        if name == "documents" and mult > 1:
            # Tag every word: replica i shares no shingles with j != i.
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
    out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def main() -> int:
    registry = load_all()
    spark = get_spark("scale_probe")
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    results: dict[int, dict[str, float]] = {}
    for m in MULTS:
        d = f"{OUT}/m{m}"
        if not os.path.isdir(d):
            for t in tables:
                replicate(spark, t, m, d)
        timings: dict[str, float] = {}
        for q in QUERIES:
            fn = registry[q].fn
            fn(spark, d).count()  # steady-state warm
            best = None
            for _ in range(2):
                t0 = time.time()
                n = fn(spark, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[q] = round(best, 2)
            print(f"# m{m} {q}: {timings[q]}s ({n} rows)", file=sys.stderr)
        results[m] = timings

    import math

    print(f"{'query':24s}" + "".join(f"m{m:<7d}" for m in MULTS) + "exponent")
    for q in QUERIES:
        t1, tn = results[MULTS[0]][q], results[MULTS[-1]][q]
        exp = math.log(tn / t1) / math.log(MULTS[-1] / MULTS[0])
        row = "".join(f"{results[m][q]:<8.2f}" for m in MULTS)
        print(f"{q:24s}{row}{exp:.2f}")

    # What did AQE pick for the big join at 10x?
    df = registry["join_multiway"].fn(spark, f"{OUT}/m{MULTS[-1]}")
    df.collect()
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ).split("== Initial Plan ==")[0]
    joins = [ln.strip() for ln in plan.splitlines() if "Join" in ln]
    print("\njoin_multiway mechanisms at 10x:")
    for j in joins:
        print(" ", j)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
