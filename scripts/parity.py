#!/usr/bin/env python
"""Run the local DuckDB-oracle parity check over the query registry.

Usage: python scripts/parity.py [--sf DIR] [--json OUT] [--unrecorded]
                                [--slice N [--slices M]] [name ...]

--unrecorded selects exactly the keys with no driver CORRECTNESS
record yet (the complement of __spark_entry__._DRIVER_RECORDED), in
the same order the driver would enumerate them.  --json writes a
machine-readable artifact of every per-key outcome.

--slice N picks the rotating certification slice: key k belongs to
slice N iff int(md5(k)[:8], 16) % M == N % M (M = --slices, default
8 -> ~47 keys per slice over the 375-key registry).  Passing the
round number as N sweeps the whole registry every M rounds with no
state beyond the round counter; md5 keeps membership stable under
registry growth (a new key lands in exactly one slice, existing
assignments never move).  Keys whose docstring-certified envelope
ends below the probed scale are recorded as skipped, not run
(_ENVELOPE_BELOW, per-key reason) — a skip is visible in the
artifact, never a silent drop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

from py_pubsub_pipeline_spark.oracle import compare, duckdb_connect  # noqa: E402
from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402

# Keys whose docstring-certified scale envelope ends BELOW a probe
# scale: scale-name -> {key: reason}.  Slice runs record these as
# skipped rows (reason in the artifact) instead of running them.
_ENVELOPE_BELOW = {
    "sf10": {
        "agg_countmin_topk": (
            "certified exact through sf1; the near-uniform sf10 token "
            "counts defeat any broadcast-width slate and the plan's "
            "assert_true guard raises by design (see docstring)"
        ),
        "sim_pairs_cosine": (
            "deliberately-quadratic exact diagnostic (all-pairs "
            "cosine): the DuckDB oracle is an O(N^2) nested loop — "
            "1.25e11 pairs at sf10, days of oracle time.  The Spark "
            "side tiles adaptively (round 7) and remains runnable; "
            "certified through sf1 (2.5e9 pairs).  The sub-quadratic "
            "production paths (sim_lsh_bucketed, sim_ivf, "
            "dedup_minhash_lsh) certify at sf10 instead"
        ),
        "dedup_embedding": (
            "same all-pairs oracle as sim_pairs_cosine — "
            "oracle-infeasible at sf10, certified through sf1; "
            "LSH/minhash variants are the at-scale path"
        ),
        "dedup_minhash_lsh": (
            "FULL oracle infeasible at sf10 (16 md5 minhash slots "
            "over the ~500M-shingle corpus + exact verify exhausted "
            "a 56GB temp cap, round 7); exact through sf1.  Round 9 "
            "adds the SAMPLED-SUBCORPUS sf10 verification instead: "
            "the full Spark run's output restricted to a "
            "deterministic 1/16 md5 doc sample hash-matches the "
            "oracle on that subcorpus exactly (restriction property, "
            "scripts/minhash_sf10_sampled.py; "
            "PARITY_r09_minhash_sampled_sf10.json, 116 pairs, 2/2)"
        ),
        "dedup_minhash_estimate": (
            "same md5-minhash oracle family as dedup_minhash_lsh — "
            "full oracle exhausted a 56GB temp cap; exact through "
            "sf1, and sf10-verified on the sampled subcorpus "
            "(PARITY_r09_minhash_sampled_sf10.json, 2/2 hash-exact "
            "with the full Spark run)"
        ),
        "join_full": (
            "COMPARISON-infeasible at sf10, not engine-infeasible: "
            "the full-outer output is 76M rows and this harness "
            "replicates the driver's check (collect both engines' "
            "results into Python and canonicalize) — the collect "
            "killed a 16g sweep JVM.  The Spark plan itself is a "
            "plain sort-merge full-outer join, certified through sf1 "
            "(7.6M rows collected and hash-matched)"
        ),
    },
}
# Round 9: sim_knn_graph_blocked and dedup_semantic_prune left this
# table — their sign-prefix width is now corpus-adaptive
# (functions/blocking.py: 9 bits at sf10 -> ~4.9e7 in-block pairs,
# measured), so both certify at sf10 like the rest of the registry.


def _slice_of(key: str, slices: int) -> int:
    import hashlib

    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % slices


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", default=None,
                    help="write per-key outcomes to this JSON file")
    ap.add_argument("--unrecorded", action="store_true",
                    help="run only keys with no driver CORRECTNESS "
                         "record, in driver enumeration order")
    ap.add_argument("--slice", type=int, default=None,
                    help="rotating certification slice: run keys with "
                         "md5-bucket == SLICE %% --slices")
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry = load_all()
    skipped: dict[str, str] = {}
    if args.unrecorded:
        import __spark_entry__ as entry

        names = [n for n in entry.queries()
                 if n not in entry._DRIVER_RECORDED]
    elif args.slice is not None:
        names = [n for n in sorted(registry)
                 if _slice_of(n, args.slices) == args.slice % args.slices]
    else:
        names = args.names or sorted(registry)
    # Documented scale envelopes apply in EVERY selection mode — a
    # named sweep list must not re-run a key whose envelope ends
    # below the probed scale (recorded as a skip, never silently).
    env = _ENVELOPE_BELOW.get(os.path.basename(args.sf.rstrip("/")), {})
    skipped = {n: env[n] for n in names if n in env}
    names = [n for n in names if n not in skipped]
    spark = get_spark("parity")
    con = duckdb_connect(args.sf)
    n_fail = 0
    results: dict[str, dict] = {}

    def _selector() -> str:
        if args.unrecorded:
            return "unrecorded"
        if args.slice is not None:
            return (f"slice {args.slice % args.slices}"
                    f"/{args.slices} (md5-bucket)")
        return "named"

    def _checkpoint() -> None:
        """Rewrite the artifact after EVERY key (atomic rename), with
        a `partial` marker while keys remain — a sweep killed by a
        box deadline loses nothing and needs no log salvage."""
        if not args.json:
            return
        art = {
            "sf_dir": args.sf,
            "selector": _selector(),
            "passed": sum(1 for v in results.values() if v.get("ok")),
            "total": sum(1 for v in results.values()
                         if "skipped" not in v),
            "results": results,
        }
        not_run = [n for n in names if n not in results]
        if not_run:
            art["partial"] = True
            art["not_run"] = not_run
        tmp = args.json + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(art, fh, indent=1, sort_keys=True)
        os.replace(tmp, args.json)
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
            msg = f"EXC {type(e).__name__}: {str(e)[:300]}"
            print(f"!! {name}: {msg}")
            if "Connection refused" in msg:
                # The Spark JVM is gone — every later key would be
                # junk failures.  Abort loudly; the incremental
                # artifact keeps everything finished so far and lists
                # the rest under not_run for a restart.
                print(f"-- ABORT: Spark JVM dead at {name}; "
                      f"artifact preserves completed keys")
                _checkpoint()
                return 2
            results[name] = {"ok": False, "why": msg}
            n_fail += 1
            _checkpoint()
            # A DuckDB connection that hit a resource cap can be left
            # corrupt (observed: temp accounting stuck at the cap,
            # then a native segfault keys later, taking the whole
            # sweep down).  A fresh connection per failure is cheap.
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
            con = duckdb_connect(args.sf)
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
        _checkpoint()
    for name, why in skipped.items():
        print(f"skip {name}: {why[:120]}")
        results[name] = {"ok": None, "skipped": why}
    print(f"-- {len(names) - n_fail}/{len(names)} passed"
          + (f", {len(skipped)} skipped (documented envelope)"
             if skipped else ""))
    if args.json:
        _checkpoint()
        print(f"-- wrote {args.json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
