#!/usr/bin/env python
"""Phased per-key probe (guide §1): split a registered key's wall into
DRIVER-SIDE plan construction (fn() return) vs EXECUTION (count(), the
bench's timed action) vs warm re-run — the split that exposed the DP
family's 13.8 s py4j build tax.  Measurement only; never run by the
driver bench.

Usage: python scripts/phase_probe.py [--sf DIR] [--runs N] name ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# import root derived from this file, not the cwd (ADVICE r14)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    registry = load_all()
    spark = get_spark("phase_probe")
    out: dict[str, dict] = {}
    for name in args.names:
        spec = registry.get(name)
        if spec is None:
            print(f"?? {name}: not registered", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"probe: {name}")
        rows = []
        for i in range(args.runs):
            # perf_counter: monotonic — sub-second phase deltas must
            # not absorb wall-clock (NTP) steps (ADVICE r14)
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            rows.append((round(t1 - t0, 3), round(t2 - t1, 3)))
        out[name] = {"build_exec_pairs": rows}
        print(f"{name}: " + "  ".join(
            f"run{i}: build={b}s exec={e}s" for i, (b, e) in enumerate(rows)),
            file=sys.stderr)
        # free the key's localCheckpoint / persist blocks between keys
        # (the time_registry.py discipline) so later keys measure the
        # query, not block-manager pressure
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist()
        except Exception:
            pass
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
