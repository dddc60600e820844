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
