#!/usr/bin/env python
"""Run the local DuckDB-oracle parity check over the query registry.

Usage: python scripts/parity.py [--sf DIR] [--json OUT] [--unrecorded]
                                [name ...]

--unrecorded selects exactly the keys with no driver CORRECTNESS
record yet (the complement of __spark_entry__._DRIVER_RECORDED), in
the same order the driver would enumerate them.  --json writes a
machine-readable artifact of every per-key outcome.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from py_pubsub_pipeline_spark.oracle import compare, duckdb_connect  # noqa: E402
from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", default=None,
                    help="write per-key outcomes to this JSON file")
    ap.add_argument("--unrecorded", action="store_true",
                    help="run only keys with no driver CORRECTNESS "
                         "record, in driver enumeration order")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry = load_all()
    if args.unrecorded:
        import __spark_entry__ as entry

        names = [n for n in entry.queries()
                 if n not in entry._DRIVER_RECORDED]
    else:
        names = args.names or sorted(registry)
    spark = get_spark("parity")
    con = duckdb_connect(args.sf)
    n_fail = 0
    results: dict[str, dict] = {}
    for name in names:
        if name not in registry:
            print(f"?? {name}: not registered")
            results[name] = {"ok": False, "why": "not registered"}
            n_fail += 1
            continue
        t0 = time.time()
        try:
            rep = compare(spark, registry[name], args.sf, con)
        except Exception as e:  # noqa: BLE001
            print(f"!! {name}: EXC {type(e).__name__}: {str(e)[:300]}")
            results[name] = {
                "ok": False,
                "why": f"EXC {type(e).__name__}: {str(e)[:300]}",
            }
            n_fail += 1
            continue
        dt = time.time() - t0
        if rep["ok"]:
            print(f"ok {name}: {rep['spark_rows']} rows [{rep['mode']}] {dt:.1f}s")
            results[name] = {"ok": True, "rows": rep["spark_rows"],
                             "mode": rep["mode"], "sec": round(dt, 2)}
        else:
            n_fail += 1
            print(f"FAIL {name}: {rep.get('why', '')[:500]}")
            results[name] = {"ok": False,
                             "why": rep.get("why", "")[:500]}
        sys.stdout.flush()
    print(f"-- {len(names) - n_fail}/{len(names)} passed")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({
                "sf_dir": args.sf,
                "selector": "unrecorded" if args.unrecorded else "named",
                "passed": len(names) - n_fail,
                "total": len(names),
                "results": results,
            }, fh, indent=1, sort_keys=True)
        print(f"-- wrote {args.json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
