"""Brute-force verification of sim_pq_adc (product-quantized ADC):
the Spark/oracle hash parity proves engine agreement; this recomputes
the whole PQ pipeline in NumPy and checks the math and the retrieval
quality floor."""

from __future__ import annotations

import numpy as np

from py_pubsub_pipeline_spark.queries.similarity import (
    PQ_K, PQ_M, PQ_SUB, TOP_K,
    sim_pq_adc,
)
from py_pubsub_pipeline_spark.tables import table

from conftest import SF_SMALL


def _corpus(spark):
    rows = (
        table(spark, SF_SMALL, "embeddings")
        .select("vec_id", "embedding").collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = ids.argsort()
    return ids[order], x[order]


def _numpy_pq(ids, x):
    cents = x[ids < PQ_K]  # codebook = first PQ_K vectors
    d2u = np.empty((len(ids), PQ_M, PQ_K), dtype=np.int64)
    for m in range(PQ_M):
        xs = x[:, m * PQ_SUB:(m + 1) * PQ_SUB]
        cs = cents[:, m * PQ_SUB:(m + 1) * PQ_SUB]
        d2 = ((xs[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
        d2u[:, m, :] = np.floor(d2 * 1e6 + 0.5).astype(np.int64)
    codes = (d2u * 100 + np.arange(PQ_K)[None, None, :]).argmin(axis=2)
    return d2u, codes


def test_pq_adc_matches_numpy_and_hits_recall_floor(spark):
    ids, x = _corpus(spark)
    d2u, codes = _numpy_pq(ids, x)
    got = {}
    for r in sim_pq_adc(spark, SF_SMALL).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rnk"], r["neighbor_id"], r["adc_micro"])
        )
    assert len(got) == len([i for i in ids if i < 50])
    idx_of = {int(v): i for i, v in enumerate(ids)}
    hits = total = 0
    for q, rows in got.items():
        rows.sort()
        qi = idx_of[q]
        # expected ADC distance from the NumPy LUT + codes (1-ulp-free:
        # both sides are exact int64 sums)
        adc_all = np.array([
            sum(int(d2u[qi, m, codes[ci, m]]) for m in range(PQ_M))
            for ci in range(len(ids))
        ])
        for rnk, nid, adc in rows:
            assert adc == adc_all[idx_of[nid]]
        # the returned top-k IS the exact ADC top-k under the
        # (adc, neighbor_id) order
        cand = sorted(
            (int(adc_all[i]), int(ids[i]))
            for i in range(len(ids)) if ids[i] != q
        )[:TOP_K]
        assert [(a, n) for _, n, a in rows] == [(a, n) for a, n in cand]
        # recall@k of PQ-ADC vs exact L2 top-k
        l2 = ((x - x[qi]) ** 2).sum(axis=1)
        exact = [
            int(ids[i]) for i in np.lexsort((ids, l2))
            if ids[i] != q
        ][:TOP_K]
        hits += len({n for _, n, _ in rows} & set(exact))
        total += TOP_K
    # 32-bit PQ codes on 64-dim vectors with an untrained 16-sample
    # codebook are LOSSY (that's the 64x compression deal): measured
    # recall@5 here is ~0.18 vs ~0.01 random — 18x random.  Floor at
    # 8x random; trained codebooks (ml_kmeans_train per subspace) and
    # exact rescoring of the PQ top-R are the production recall path.
    assert hits / total > 0.08, hits / total


def test_pq_rescore_returns_exact_topk_of_candidates_and_lifts_recall(spark):
    from py_pubsub_pipeline_spark.queries.similarity import (
        PQ_RESCORE_R, sim_pq_rescore,
    )

    ids, x = _corpus(spark)
    d2u, codes = _numpy_pq(ids, x)
    idx_of = {int(v): i for i, v in enumerate(ids)}
    got = {}
    for r in sim_pq_rescore(spark, SF_SMALL).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rnk"], r["neighbor_id"], r["exact_micro"])
        )
    hits_rescore = hits_adc = total = 0
    adc_got = {}
    for r in sim_pq_adc(spark, SF_SMALL).collect():
        adc_got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q, rows in got.items():
        rows.sort()
        qi = idx_of[q]
        # NumPy twin: ADC top-R candidates, exactly rescored
        adc_all = np.array([
            sum(int(d2u[qi, m, codes[ci, m]]) for m in range(PQ_M))
            for ci in range(len(ids))
        ])
        cand = [
            n for _, n in sorted(
                (int(adc_all[i]), int(ids[i]))
                for i in range(len(ids)) if ids[i] != q
            )[:PQ_RESCORE_R]
        ]
        l2 = ((x - x[qi]) ** 2).sum(axis=1)
        ex_micro = {
            n: int(np.floor(l2[idx_of[n]] * 1e6 + 0.5)) for n in cand
        }
        want = sorted((v, n) for n, v in ex_micro.items())[:TOP_K]
        assert [(v, n) for _, n, v in rows] == want
        exact = [
            int(ids[i]) for i in np.lexsort((ids, l2)) if ids[i] != q
        ][:TOP_K]
        hits_rescore += len({n for _, n, _ in rows} & set(exact))
        hits_adc += len(adc_got[q] & set(exact))
        total += TOP_K
    # the whole point of the two-stage ladder: rescoring the top-R
    # candidates recovers recall the raw 32-bit code loses
    assert hits_rescore > hits_adc, (hits_rescore, hits_adc)
    assert hits_rescore / total > 0.3, hits_rescore / total


def test_pq_distortion_is_sum_of_subspace_minima(spark):
    from py_pubsub_pipeline_spark.queries.similarity import (
        emb_pq_distortion,
    )

    ids, x = _corpus(spark)
    d2u, _ = _numpy_pq(ids, x)
    idx_of = {int(v): i for i, v in enumerate(ids)}
    rows = emb_pq_distortion(spark, SF_SMALL).collect()
    assert len(rows) == len(ids)
    for r in rows:
        i = idx_of[r["vec_id"]]
        want = int(d2u[i].min(axis=1).sum())
        assert r["distortion_micro"] == want
        n2 = int(np.floor((x[i] ** 2).sum() * 1e6 + 0.5))
        assert r["norm2_micro"] == n2
        assert r["rel_ppm"] == want * 1_000_000 // max(n2, 1)
        # codebook vectors reconstruct themselves exactly in their
        # own subspaces
        if r["vec_id"] < PQ_K:
            assert r["distortion_micro"] == 0


def test_pq_trained_matches_numpy_lloyd_and_beats_untrained(spark):
    from py_pubsub_pipeline_spark.queries.similarity import sim_pq_trained

    ids, x = _corpus(spark)
    d2u0, codes0 = _numpy_pq(ids, x)
    # one Lloyd round in NumPy: per (m, k) mean of assigned subvectors
    cents1 = np.zeros((PQ_M, PQ_K, PQ_SUB))
    alive = np.zeros((PQ_M, PQ_K), dtype=bool)
    for m in range(PQ_M):
        xs = x[:, m * PQ_SUB:(m + 1) * PQ_SUB]
        for k in range(PQ_K):
            mask = codes0[:, m] == k
            if mask.any():
                alive[m, k] = True
                cents1[m, k] = xs[mask].mean(axis=0)
    # re-encode + ADC on the trained codebook (integer micro units)
    d2u1 = np.full((len(ids), PQ_M, PQ_K), 2**62, dtype=np.int64)
    for m in range(PQ_M):
        xs = x[:, m * PQ_SUB:(m + 1) * PQ_SUB]
        for k in range(PQ_K):
            if alive[m, k]:
                d2 = ((xs - cents1[m, k]) ** 2).sum(axis=1)
                d2u1[:, m, k] = np.floor(d2 * 1e6 + 0.5).astype(np.int64)
    codes1 = (d2u1 * 100 + np.arange(PQ_K)[None, None, :]).argmin(axis=2)
    got = {}
    for r in sim_pq_trained(spark, SF_SMALL).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rnk"], r["neighbor_id"], r["adc_micro"])
        )
    idx_of = {int(v): i for i, v in enumerate(ids)}
    hits_tr = hits_raw = total = 0
    from py_pubsub_pipeline_spark.queries.similarity import sim_pq_adc as _adc
    raw = {}
    for r in _adc(spark, SF_SMALL).collect():
        raw.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q, rows in got.items():
        rows.sort()
        qi = idx_of[q]
        adc_all = np.array([
            sum(int(d2u1[qi, m, codes1[ci, m]]) for m in range(PQ_M))
            for ci in range(len(ids))
        ])
        for rnk, nid, adc in rows:
            assert adc == adc_all[idx_of[nid]], (q, nid)
        cand = sorted(
            (int(adc_all[i]), int(ids[i]))
            for i in range(len(ids)) if ids[i] != q
        )[:TOP_K]
        assert [(a, n) for _, n, a in rows] == [(a, n) for a, n in cand]
        l2 = ((x - x[qi]) ** 2).sum(axis=1)
        exact = [int(ids[i]) for i in np.lexsort((ids, l2))
                 if ids[i] != q][:TOP_K]
        hits_tr += len({n for _, n, _ in rows} & set(exact))
        hits_raw += len(raw[q] & set(exact))
        total += TOP_K
    # the Lloyd round must actually buy recall on this corpus
    assert hits_tr > hits_raw, (hits_tr, hits_raw)


def test_ivfpq_matches_numpy_and_respects_routing(spark):
    """Recompute the full IVF-PQ pipeline (coarse assignment,
    residuals, residual codebook from vectors [NLIST, NLIST+PQ_K),
    per-(query, probed-cell) LUT, long-form ADC) in NumPy and check
    the Spark output row-for-row; also assert every returned neighbor
    lives in one of the query's NPROBE probed cells (the IVF
    contract)."""
    from py_pubsub_pipeline_spark.queries.similarity import (
        IVF_NLIST, IVF_NPROBE, IVF_N_QUERIES, sim_ivfpq,
    )

    ids, x = _corpus(spark)
    idx_of = {int(v): i for i, v in enumerate(ids)}
    cen = x[ids < IVF_NLIST]
    d2c = np.floor(
        ((x[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2) * 1e6 + 0.5
    ).astype(np.int64)
    cellorder = (d2c * 100 + np.arange(IVF_NLIST)[None, :]).argsort(
        axis=1, kind="stable"
    )
    cell = cellorder[:, 0]
    res = x - cen[cell]
    cb_mask = (ids >= IVF_NLIST) & (ids < IVF_NLIST + PQ_K)
    codes = np.empty((len(ids), PQ_M), dtype=np.int64)
    cbs = []
    for m in range(PQ_M):
        rs = res[:, m * PQ_SUB:(m + 1) * PQ_SUB]
        cs = res[cb_mask][:, m * PQ_SUB:(m + 1) * PQ_SUB]
        cbs.append(cs)
        d2u = np.floor(
            ((rs[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2) * 1e6 + 0.5
        ).astype(np.int64)
        codes[:, m] = (d2u * 100 + np.arange(PQ_K)[None, :]).argmin(axis=1)
    got = {}
    for r in sim_ivfpq(spark, SF_SMALL).collect():
        got.setdefault(int(r["query_id"]), []).append(
            (int(r["rnk"]), int(r["neighbor_id"]), int(r["adc_micro"]))
        )
    assert set(got) <= set(range(IVF_N_QUERIES))
    for q, rows in got.items():
        qi = idx_of[q]
        probed = set(int(c) for c in cellorder[qi, :IVF_NPROBE])
        # every neighbor is from a probed cell, never the query itself
        for _, nid, _ in rows:
            assert int(cell[idx_of[nid]]) in probed
            assert nid != q
        # ADC scores match the numpy recomputation exactly, and the
        # returned rows are the true integer top-k of the candidates
        cand = []
        for i in range(len(ids)):
            if int(cell[i]) not in probed or int(ids[i]) == q:
                continue
            qr = x[qi] - cen[cell[i]]
            adc = 0
            for m in range(PQ_M):
                qs = qr[m * PQ_SUB:(m + 1) * PQ_SUB]
                diff = qs - cbs[m][codes[i, m]]
                adc += int(np.floor((diff @ diff) * 1e6 + 0.5))
            cand.append((adc, int(ids[i])))
        cand.sort()
        assert [(a, n) for _, n, a in sorted(rows)] == [
            (a, n) for a, n in cand[:TOP_K]
        ]


def test_fixture_declared_schemas_match_inferred(spark):
    """read_fixture declares each persisted-index schema statically to
    skip the per-invocation parquet footer inference; a writer change
    that drifts the on-disk schema must fail HERE, not surface as
    declared-schema nulls in a serve path."""
    from py_pubsub_pipeline_spark.queries.formats import _fixture_dir
    from py_pubsub_pipeline_spark.queries.similarity import (
        _IVFPQ_CB_DDL,
        _IVFPQ_CEN_DDL,
        _IVFPQ_CODES_DDL,
        _KGS_EDGES_DDL,
        _PQ_CODES_DDL,
        _ivfpq_trained_index,
    )
    from py_pubsub_pipeline_spark.registry import load_all

    reg = load_all()
    # building the fixtures is idempotent (done-flag guarded)
    reg.get("sim_pq_adc").fn(spark, SF_SMALL)
    reg.get("sim_ivfpq").fn(spark, SF_SMALL)
    reg.get("sim_knn_graph_search").fn(spark, SF_SMALL)
    _ivfpq_trained_index(spark, SF_SMALL)
    for kind, ddl in [
        ("pq_codes", _PQ_CODES_DDL),
        ("ivfpq_codes", _IVFPQ_CODES_DDL),
        ("ivfpq_trained_cen", _IVFPQ_CEN_DDL),
        ("ivfpq_trained_cb", _IVFPQ_CB_DDL),
        ("knn_graph_hnsw_hubmid", _KGS_EDGES_DDL),
    ]:
        path = _fixture_dir(SF_SMALL, kind)
        inferred = spark.read.parquet(path).schema
        declared = spark.read.schema(ddl).parquet(path).schema
        assert inferred == declared, (
            f"{kind}: declared DDL drifted from the written schema: "
            f"{inferred.simpleString()} != {declared.simpleString()}"
        )


def test_formats_fixture_schemas_match_inferred(spark):
    """r15 (VERDICT r14 item 5): the lakehouse-layout fixtures in
    queries/formats.py now declare their schemas on the serve path
    (skipping the per-invocation footer inference); a writer change
    that drifts any written schema must fail HERE, not surface as
    declared-schema nulls."""
    import os

    from py_pubsub_pipeline_spark.queries import formats as FM
    from py_pubsub_pipeline_spark.registry import load_all

    reg = load_all()
    # building every fixture is idempotent (done-flag guarded)
    for key in (
        "scan_partition_pruned", "scan_partition_overwrite",
        "scan_manifest_snapshot", "join_dpp_partition_pruned",
        "scan_partition_evolution", "scan_equality_deletes",
        "scan_minmax_skipping",
    ):
        reg.get(key).fn(spark, SF_SMALL).count()

    def leaf(base: str, prefix: str) -> str:
        for d in sorted(os.listdir(base)):
            if d.startswith(prefix):
                return os.path.join(base, d)
        raise AssertionError(f"no {prefix}* under {base}")

    by_status = FM._cache_dir(SF_SMALL, "orders_by_status")
    by_both = FM._cache_dir(SF_SMALL, "orders_by_status_priority")
    spec2_status = leaf(by_both, "o_orderstatus=")
    checks = [
        ("orders_by_status (partitioned)", by_status,
         FM._ORDERS_BY_STATUS_DDL),
        ("part_overwrite (partitioned customer)",
         FM._cache_dir(SF_SMALL, "part_overwrite"),
         FM._CUSTOMER_BY_SEG_DDL),
        ("manifest file", os.path.join(
            FM._cache_dir(SF_SMALL, "manifest_snap"), "file-0"),
         FM._ORDERS_DDL),
        ("status_dim", FM._cache_dir(SF_SMALL, "status_dim"),
         FM._STATUS_DIM_DDL),
        ("delete keys", FM._delete_file_fixture(spark, SF_SMALL),
         FM._DELETE_KEYS_DDL),
        ("range file", os.path.join(
            FM._cache_dir(SF_SMALL, "range_files"), "range-0"),
         FM._ORDERS_DDL),
        ("spec-1 leaf", leaf(by_status, "o_orderstatus="),
         FM._ORDERS_LEAF_SPEC1_DDL),
        ("spec-2 leaf", leaf(spec2_status, "o_orderpriority="),
         FM._ORDERS_LEAF_SPEC2_DDL),
    ]
    for name, path, ddl in checks:
        inferred = spark.read.parquet(path).schema
        declared = spark.read.schema(ddl).parquet(path).schema
        assert inferred == declared, (
            f"{name}: declared DDL drifted from the written schema: "
            f"{inferred.simpleString()} != {declared.simpleString()}"
        )
