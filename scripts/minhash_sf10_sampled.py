#!/usr/bin/env python
"""Sampled-subcorpus sf10 oracle for the minhash twins (round-9 #7).

`dedup_minhash_lsh` / `dedup_minhash_estimate` run fine on Spark at
sf10, but their FULL DuckDB oracles are infeasible there (re-deriving
16/32 md5 minhash slots over the ~500M-shingle corpus plus the exact
pair join exhausted a 56 GB temp cap — scripts/parity.py envelope).
This harness turns that skip into a bounded-confidence green row via
the RESTRICTION PROPERTY of both queries: every output row depends
ONLY on its two endpoint documents (per-doc signatures, pair-local
shared-shingle counts), so

    full_result  ∩  (sampled_docs x sampled_docs)
        ==  oracle run on the sampled-docs subcorpus.

Protocol:
  1. Spark runs the FULL query at sf10 (the real engine run).
  2. The result is filtered to pairs whose BOTH endpoints fall in a
     deterministic md5 doc sample (first hex nibble of
     md5(doc_id::varchar) == '0'  ->  1/16 of docs, 1/256 of pairs).
  3. DuckDB runs the UNCHANGED oracle SQL with the `documents` view
     re-pointed at the sampled subcorpus (~31k docs, ~31M shingles at
     sf10 — 16x less signature work, 256x fewer exact pairs).
  4. Exact hash comparison (the driver's canonicalization) on the
     restricted universe — both false positives AND false negatives
     among sampled docs would surface.

Confidence contract: exactness is verified on a 1/256 uniform slice
of the pair universe; the remaining 255/256 runs the same plan on
the same data distribution.  Run:

    python scripts/minhash_sf10_sampled.py [--sf /tmp/sf10] \
        [--json PARITY_r09_minhash_sampled_sf10.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from py_pubsub_pipeline_spark.oracle import (  # noqa: E402
    _canon_rows,
    duckdb_connect,
)
from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402

KEYS = ("dedup_minhash_lsh", "dedup_minhash_estimate")
# First md5 nibble of the decimal doc_id string — identical text on
# both engines (BIGINT -> decimal string, no sign/padding ambiguity).
NIBBLE = "0"


def _spark_sampled(col: str):
    return F.substring(F.md5(F.col(col).cast("string")), 1, 1) == NIBBLE


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf10")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    registry = load_all()
    spark = get_spark("minhash_sampled")
    con = duckdb_connect(args.sf)
    path = os.path.join(args.sf, "documents.parquet")
    if os.path.isdir(path):
        path = os.path.join(path, "*.parquet")
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{path}') "
        f"WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{NIBBLE}'"
    )
    n_docs, n_sampled = con.execute(
        f"SELECT (SELECT COUNT(*) FROM read_parquet('{path}')), "
        "(SELECT COUNT(*) FROM documents)"
    ).fetchone()

    results: dict[str, dict] = {}
    rc = 0
    for name in KEYS:
        spec = registry[name]
        t0 = time.time()
        sdf = spec.fn(spark, args.sf).filter(
            _spark_sampled("a_id") & _spark_sampled("b_id")
        )
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        t0 = time.time()
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        t_oracle = time.time() - t0
        rep = {
            "mode": "oracle-sampled-1/256-pairs",
            "spark_full_run": True,
            "sample_nibble": NIBBLE,
            "docs_total": int(n_docs),
            "docs_sampled": int(n_sampled),
            "rows": len(srows),
            "spark_sec": round(t_spark, 1),
            "oracle_sec": round(t_oracle, 1),
        }
        if sorted(scols) != sorted(ocols):
            rep["ok"] = False
            rep["why"] = f"cols {sorted(scols)} vs {sorted(ocols)}"
        elif len(srows) != len(orows):
            rep["ok"] = False
            rep["why"] = f"rows spark={len(srows)} oracle={len(orows)}"
        else:
            cs, co = _canon_rows(scols, srows), _canon_rows(ocols, orows)
            rep["ok"] = cs == co
            if not rep["ok"]:
                rep["why"] = "value mismatch: " + str(
                    [(a, b) for a, b in zip(cs, co) if a != b][:3]
                )
        results[name] = rep
        flag = "ok" if rep["ok"] else "!!"
        print(f"{flag} {name}: {len(srows)} sampled pairs "
              f"[spark {t_spark:.0f}s full + filter, "
              f"oracle {t_oracle:.0f}s on {n_sampled}/{n_docs} docs]"
              + ("" if rep["ok"] else f"  {rep.get('why')}"))
        if not rep["ok"]:
            rc = 1
    if args.json:
        art = {
            "sf_dir": args.sf,
            "selector": "minhash sampled-pair sf10 (restriction property)",
            "passed": sum(1 for v in results.values() if v["ok"]),
            "total": len(results),
            "results": results,
        }
        with open(args.json, "w") as fh:
            json.dump(art, fh, indent=1, sort_keys=True)
        print(f"-- wrote {args.json}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
