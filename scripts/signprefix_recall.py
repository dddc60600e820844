#!/usr/bin/env python
"""Recall audit for the sign-prefix blocking family (round-9 task).

dedup_semantic_prune / sim_knn_graph_blocked block candidates by the
sign pattern of the leading embedding dimensions; the width is
corpus-adaptive (functions/blocking.py).  Widening the prefix trades
recall at sign boundaries — this script MEASURES that trade so the
"widen with the corpus" posture carries a number, not a hope:

  * kNN recall@k: |blocked top-k ∩ exact top-k| / |exact top-k|,
    averaged over all vectors (exact = brute-force cosine over the
    whole corpus, computed driver-side with numpy — this is an audit
    harness at probe scale, not a registered query).
  * near-dup pair recall: fraction of all exact pairs with cosine >=
    SEM_TAU that share a block (the dedup_semantic_prune candidate
    contract).

Sweeps widths 4..12 plus the adaptive width for the corpus, so the
curve shows what each added bit costs.  Run:

    python scripts/signprefix_recall.py [--sf DIR] [--k 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from py_pubsub_pipeline_spark.functions.blocking import (  # noqa: E402
    SIGN_MIN_BITS,
    adaptive_bits_value,
)
from py_pubsub_pipeline_spark.queries.rag import SEM_TAU_MICRO  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--max-bits", type=int, default=12)
    args = ap.parse_args()

    import duckdb

    con = duckdb.connect()
    glob = os.path.join(args.sf, "embeddings.parquet")
    if os.path.isdir(glob):
        glob = os.path.join(glob, "*.parquet")
    rows = con.execute(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM '{glob}' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(ids)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    signs = (X >= 0).astype(np.int8)  # sign of normalized == sign of raw

    # exact cosine structures (O(N^2) driver-side; probe scale only)
    C = X @ X.T
    np.fill_diagonal(C, -np.inf)
    order = np.argsort(-C, axis=1, kind="stable")[:, : args.k]
    tau = SEM_TAU_MICRO / 1e6
    dup_i, dup_j = np.where(np.triu(C >= tau, k=1))

    adaptive = adaptive_bits_value(n)
    out = {"sf": args.sf, "n": n, "k": args.k, "adaptive_bits": adaptive,
           "tau": tau, "n_exact_dup_pairs": int(len(dup_i)), "widths": {}}
    for bits in [*range(SIGN_MIN_BITS, args.max_bits + 1)]:
        key = signs[:, :bits]
        same = (key[:, None, :] == key[None, :, :]).all(axis=2) \
            if n <= 4000 else None
        if same is None:
            # pack bits -> int key to avoid the N^2 bool tensor
            packed = key @ (1 << np.arange(bits, dtype=np.int64))
            same_fn = lambda i, j: packed[i] == packed[j]  # noqa: E731
        hits = 0
        for i in range(n):
            top = order[i]
            if same is not None:
                hits += int(same[i, top].sum())
            else:
                hits += int(sum(1 for t in top if same_fn(i, t)))
        knn_recall = hits / (n * args.k)
        if same is not None:
            pair_rec = float(same[dup_i, dup_j].mean()) if len(dup_i) else 1.0
        else:
            pair_rec = (
                float(np.mean([same_fn(a, b) for a, b in zip(dup_i, dup_j)]))
                if len(dup_i) else 1.0
            )
        # expected in-block pair count at this width (the cost side)
        packed = key @ (1 << np.arange(bits, dtype=np.int64))
        _, counts = np.unique(packed, return_counts=True)
        pairs = int((counts * (counts - 1) // 2).sum())
        tag = " <- adaptive" if bits == adaptive else ""
        print(f"bits={bits:2d}: knn_recall@{args.k}={knn_recall:.3f} "
              f"dup_pair_recall={pair_rec:.3f} in_block_pairs={pairs}{tag}")
        out["widths"][bits] = {
            "knn_recall": round(knn_recall, 4),
            "dup_pair_recall": round(pair_rec, 4),
            "in_block_pairs": pairs,
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
