#!/usr/bin/env python
"""Measure sim_lsh_bucketed's recall@3 against exact ground truth.

Ground truth = sim_topk (brute-force cosine) restricted to rnk <= 3.
Recall@3 = |LSH top-3 ∩ exact top-3| / |exact top-3|, averaged over
the N_QUERIES probe vectors. Also reports the single-band number (the
round-1 formulation) so the OR-construction lift is on the record.

Run:  python scripts/lsh_recall.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_pubsub_pipeline_spark.registry import load_all  # noqa: E402
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402


def _pairs(df, k: int = 3) -> set:
    return {
        (r.query_id, r.neighbor_id) for r in df.collect() if r.rnk <= k
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import py_pubsub_pipeline_spark.queries.similarity as sim

    reg = load_all()
    spark = get_spark("lsh_recall")
    exact = _pairs(reg["sim_topk"].fn(spark, args.sf))

    results = {}
    for n_bands in (1, 4, 8, 16):
        old = sim.N_BANDS
        sim.N_BANDS = n_bands
        try:
            approx = _pairs(sim.sim_lsh_bucketed(spark, args.sf))
        finally:
            sim.N_BANDS = old
        recall = len(exact & approx) / len(exact)
        results[n_bands] = recall
        print(f"bands={n_bands}: recall@3 = {recall:.3f} "
              f"({len(exact & approx)}/{len(exact)})")

    # Multi-probe (round 11): 4 bands + Hamming-1 probes — the
    # recall-per-index-byte trade vs the 16-table OR-construction.
    mp = _pairs(reg["sim_lsh_multiprobe"].fn(spark, args.sf))
    r_mp = len(exact & mp) / len(exact)
    print(f"multiprobe (4 bands x 5 probes): recall@3 = {r_mp:.3f} "
          f"({len(exact & mp)}/{len(exact)}) — "
          f"vs bands=4 exact-only {results[4]:.3f} and bands=16 "
          f"{results[16]:.3f} at 4x the index")

    # ADC int8 recall@3 — ground truth is the exact full-precision DOT
    # ranking (ADC approximates dot product, not cosine), computed
    # driver-side over the collected corpus (bounded: recall harness
    # runs at probe scale, not corpus scale).
    import numpy as np

    from py_pubsub_pipeline_spark.tables import table

    rows = table(spark, args.sf, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    qsel = ids < sim.N_QUERIES
    D = X[qsel] @ X.T
    D[np.equal.outer(ids[qsel], ids)] = -np.inf
    exact_dot = set()
    for qi, qid in enumerate(ids[qsel]):
        top = np.lexsort((ids, -D[qi]))[:3]
        exact_dot.update((qid, ids[t]) for t in top)
    adc = _pairs(sim.sim_adc_int8(spark, args.sf))
    r_adc = len(exact_dot & adc) / len(exact_dot)
    print(f"adc_int8: recall@3 = {r_adc:.3f} "
          f"({len(exact_dot & adc)}/{len(exact_dot)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
