"""Semantic properties of the round-8 RAG/corpus-construction
operators (queries/rag.py) — invariants the DuckDB parity hash can't
express (coverage identities, estimator bounds, algorithm contracts).
"""

from __future__ import annotations

from py_pubsub_pipeline_spark.queries import rag
from py_pubsub_pipeline_spark.registry import load_all
from py_pubsub_pipeline_spark.tables import table

from conftest import SF_MED

REG = load_all()


def _rows(name, spark, sf=SF_MED):
    return REG[name].fn(spark, sf).collect()


def test_chunk_overlap_covers_every_token_exactly(spark):
    # Chunks tile each doc: starts are 0, S, 2S, ...; the union of
    # [start, start+n_tok) covers [0, n) and consecutive chunks
    # overlap by exactly W-S tokens (except short tails).
    docs = {
        r["doc_id"]: r["n"]
        for r in table(spark, SF_MED, "documents")
        .selectExpr("doc_id", "size(split(text, ' ')) AS n")
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in _rows("text_chunk_overlap", spark):
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["start_tok"])
        n = docs[doc_id]
        for i, c in enumerate(chunks):
            assert c["start_tok"] == i * rag.CHUNK_S
            assert c["chunk_id"] == i
            assert c["n_tok"] == min(rag.CHUNK_W, n - c["start_tok"])
        last = chunks[-1]
        assert last["start_tok"] + last["n_tok"] == min(
            n, last["start_tok"] + rag.CHUNK_W
        )
        assert last["start_tok"] < n <= last["start_tok"] + rag.CHUNK_W


def test_matryoshka_recall_bounded_and_self_consistent(spark):
    rows = _rows("emb_matryoshka_eval", spark)
    assert len(rows) == rag.MRL_QUERIES
    for r in rows:
        assert 0 <= r["n_common"] <= rag.MRL_K
        assert r["recall_pct"] == r["n_common"] * 100 // rag.MRL_K
    # Truncation must lose SOMETHING somewhere (16 of 64 dims) but
    # stay far above random (10/500 expected ~0.02 recall).
    mean = sum(r["n_common"] for r in rows) / len(rows)
    assert 1.0 < mean < rag.MRL_K


def test_curriculum_positions_are_a_permutation_and_interleaved(spark):
    rows = _rows("mix_curriculum", spark)
    srcs = sorted({r["source"] for r in rows})
    n_src = len(srcs)
    sidx = {s: i for i, s in enumerate(srcs)}
    # pos mod n_src identifies the source -> round-robin interleave.
    for r in rows:
        assert r["pos"] % n_src == sidx[r["source"]]
    # Within a source, ascending pos follows ascending difficulty.
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for s, rs in by_src.items():
        rs.sort(key=lambda r: r["pos"])
        toks = [r["n_tok"] for r in rs]
        assert toks == sorted(toks)
        assert [r["pos"] for r in rs] == [
            i * n_src + sidx[s] for i in range(len(rs))
        ]


def test_water_filling_respects_budget_and_caps(spark):
    import hashlib
    import math

    rows = _rows("mix_water_filling", spark)
    budget = rag.WF_BUDGET_MULT * sum(r["tok"] for r in rows)
    total = sum(r["alloc"] for r in rows)
    for r in rows:
        tier_cap = (
            rag.WF_CAP_CURATED
            if hashlib.md5(r["source"].encode()).hexdigest()[0]
            < rag.WF_TIER_GATE
            else rag.WF_CAP_WEB
        )
        assert 0 <= r["alloc"] <= r["cap"] == tier_cap * r["tok"]
        assert r["epochs_milli"] == r["alloc"] * 1000 // r["tok"]
    # Budget never exceeded; slack bounded by the lambda milli-grain
    # (1e-3 of each unsaturated domain's sqrt-weight) + per-domain
    # integer floors.
    assert total <= budget
    slack_bound = int(
        0.002 * sum(math.sqrt(r["tok"]) for r in rows)
    ) + 2 * len(rows)
    assert budget - total <= slack_bound, (budget, total)
    # The tiered caps produce a genuine water level: some domains
    # saturate at the cap, some sit below it.
    saturated = [r for r in rows if r["alloc"] == r["cap"]]
    assert saturated and len(saturated) < len(rows)
    # Unsaturated domains all sit at a common level lambda = alloc/w.
    uns = [r for r in rows if r["alloc"] < r["cap"]]
    lams = [r["alloc"] / math.sqrt(r["tok"]) for r in uns]
    assert max(lams) - min(lams) < max(lams) * 0.01
    # Every saturated domain's cap/w ratio sits at or below every
    # unsaturated level (the sorted-sweep partition is consistent).
    for s in saturated:
        assert s["cap"] / math.sqrt(s["tok"]) <= max(lams) * 1.01


def test_dp_count_noise_is_bounded_and_seeded(spark):
    rows = _rows("privacy_dp_count", spark)
    true = {
        (r["lang"], r["source"]): r["n"]
        for r in table(spark, SF_MED, "documents")
        .groupBy("lang", "source")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert {(r["lang"], r["source"]) for r in rows} == set(true)
    # Laplace(1) noise: |noise| = |ln(1-2|u-.5|)|; u has 52 bits so
    # |noise| < 37; and the draw is a pure function of the key.
    for r in rows:
        noise = float(r["noisy_n"]) - true[(r["lang"], r["source"])]
        assert abs(noise) < 37.0
    again = {
        (r["lang"], r["source"]): r["noisy_n"]
        for r in _rows("privacy_dp_count", spark)
    }
    assert again == {(r["lang"], r["source"]): r["noisy_n"] for r in rows}


def test_calibration_ece_identity(spark):
    rows = _rows("ml_calibration_ece", spark)
    n_total = sum(r["n"] for r in rows)
    ece = sum(r["n"] * r["gap_milli"] for r in rows) * 1000 // n_total
    for r in rows:
        assert r["ece_micro"] == ece
        assert r["conf_milli"] == r["bin"] * 100 + 50
        assert r["acc_milli"] == r["k"] * 1000 // r["n"]
        assert r["gap_milli"] == abs(r["acc_milli"] - r["conf_milli"])


def test_ppswor_sample_is_topk_with_ht_floor(spark):
    rows = _rows("sample_priority_ppswor", spark)
    assert len(rows) == rag.PPS_K
    keys = sorted((r["key"] for r in rows), reverse=True)
    tau_candidates = {r["ht_weight"] for r in rows if r["ht_weight"] > r["w"]}
    # All inflated weights share ONE tau, and tau is below the
    # smallest sampled key (it is the (k+1)-th priority).
    assert len(tau_candidates) <= 1
    if tau_candidates:
        (tau,) = tau_candidates
        assert tau <= keys[-1]
        for r in rows:
            assert r["ht_weight"] == max(r["w"], tau)


def _seq_dot(a, b):
    # EXACTLY Spark's F.aggregate fold order (left-to-right doubles),
    # so floor-quantized cosines match bit-for-bit.
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _cos_micro(a, b):
    import math

    return math.floor(
        _seq_dot(a, b) / (math.sqrt(_seq_dot(a, a)) * math.sqrt(_seq_dot(b, b)))
        * 1e6 + 0.5
    )


def _vecs(spark, sf=SF_MED):
    return {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in table(spark, sf, "embeddings").collect()
    }


def test_bfs_hops_matches_python_bfs(spark):
    # Recompute the multi-source BFS from the same co-purchase edges.
    from py_pubsub_pipeline_spark.queries import graph as g

    li = (
        table(spark, SF_MED, "lineitem")
        .selectExpr("l_orderkey AS ok", "l_partkey AS p")
        .distinct()
    )
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "ok")
        .selectExpr("a.p AS u", "b.p AS v")
        .filter("u <> v")
        .groupBy("u", "v")
        .count()
        .filter(f"count >= {g._KCORE_MINW}")
        .select("u", "v")
        .collect()
    )
    adj: dict[int, set] = {}
    for r in pairs:
        adj.setdefault(r["u"], set()).add(r["v"])
    verts = set(adj)
    frontier = {u for u in verts if u % g._BFS_SEED_MOD == 0}
    visited = set(frontier)
    expected = {0: len(frontier)}
    for r in range(1, g._BFS_ROUNDS + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        frontier = nxt - visited
        visited |= frontier
        expected[r] = len(frontier)
    expected[-1] = len(verts - visited)
    got = {
        r["dist"]: r["n_nodes"] for r in _rows("graph_bfs_hops", spark)
    }
    assert got == expected


def test_semantic_prune_matches_bruteforce(spark):
    vecs = _vecs(spark)
    bkt = {
        i: "".join("1" if v[d] >= 0 else "0" for d in range(rag.SEM_BITS))
        for i, v in vecs.items()
    }
    n_close = {}
    for i, v in vecs.items():
        n_close[i] = sum(
            1
            for j, u in vecs.items()
            if j < i and bkt[j] == bkt[i]
            and _cos_micro(u, v) >= rag.SEM_TAU_MICRO
        )
    rows = _rows("dedup_semantic_prune", spark)
    assert len(rows) == len(vecs)
    dropped = 0
    for r in rows:
        assert r["bkt"] == bkt[r["vec_id"]]
        assert r["n_close"] == n_close[r["vec_id"]], r
        assert r["kept"] == (r["n_close"] == 0)
        dropped += 0 if r["kept"] else 1
    assert dropped > 0  # the threshold actually prunes something


def test_mmr_rerank_matches_greedy_reference(spark):
    vecs = _vecs(spark)
    rows = _rows("sim_mmr_rerank", spark)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(rag.MMR_QUERIES))
    for qid, sel_rows in by_q.items():
        sel_rows.sort(key=lambda r: r["mmr_rank"])
        qv = vecs[qid]
        rel = {
            c: _cos_micro(qv, v) for c, v in vecs.items() if c != qid
        }
        pool = sorted(rel, key=lambda c: (-rel[c], c))[: rag.MMR_POOL]
        chosen: list[int] = []
        for t in range(1, rag.MMR_K + 1):
            best = None
            for c in pool:
                if c in chosen:
                    continue
                pen = max(
                    (_cos_micro(vecs[c], vecs[s]) for s in chosen),
                    default=0,
                )
                score = rag.MMR_WREL * rel[c] - rag.MMR_WPEN * pen
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, score)
            _, c, score = best
            chosen.append(c)
            got = sel_rows[t - 1]
            assert (got["vec_id"], got["score"]) == (c, score), (
                qid, t, got, c, score,
            )
        # Diversification really happened for at least some query if
        # the pure-relevance order differs from the MMR order.
    assert any(
        [r["vec_id"] for r in by_q[q]]
        != sorted(
            {c: _cos_micro(vecs[q], v) for c, v in vecs.items() if c != q},
            key=lambda c: (
                -_cos_micro(vecs[q], vecs[c]), c,
            ),
        )[: rag.MMR_K]
        for q in by_q
    )
