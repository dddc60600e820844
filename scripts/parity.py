#!/usr/bin/env python
"""Run the local DuckDB-oracle parity check over the query registry.

Usage: python scripts/parity.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from py_pubsub_pipeline_spark.oracle import compare, duckdb_connect  # noqa: E402
from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry = load_all()
    names = args.names or sorted(registry)
    spark = get_spark("parity")
    con = duckdb_connect(args.sf)
    n_fail = 0
    for name in names:
        if name not in registry:
            print(f"?? {name}: not registered")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            rep = compare(spark, registry[name], args.sf, con)
        except Exception as e:  # noqa: BLE001
            print(f"!! {name}: EXC {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if rep["ok"]:
            print(f"ok {name}: {rep['spark_rows']} rows [{rep['mode']}] {dt:.1f}s")
        else:
            n_fail += 1
            print(f"FAIL {name}: {rep.get('why', '')[:500]}")
    print(f"-- {len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
