"""Integration tests for the end-to-end RAG DAG (rag_pipeline.py):
each member operator is oracle-checked on its own; these verify the
COMPOSITION — survivor joins, re-pack semantics, funnel identities.
"""

from __future__ import annotations

from py_pubsub_pipeline_spark import rag_pipeline as rp
from py_pubsub_pipeline_spark.queries import rag
from py_pubsub_pipeline_spark.tables import table

from conftest import SF_MED


def test_prune_chunk_funnel_identities(spark):
    n_corpus = table(spark, SF_MED, "embeddings").count()
    kept = {r["vec_id"] for r in rp.pruned_corpus(spark, SF_MED).collect()}
    assert 0 < len(kept) < n_corpus  # the prune actually prunes
    chunk_docs = {
        r["doc_id"]
        for r in rp.chunk_index(spark, SF_MED).select("doc_id")
        .distinct().collect()
    }
    # every indexed chunk belongs to a surviving doc, and every
    # survivor has at least one chunk (every doc has >= 1 token)
    assert chunk_docs == kept


def test_index_health_covers_every_cell_consistently(spark):
    rows = rp.index_health(spark, SF_MED).collect()
    n_corpus = table(spark, SF_MED, "embeddings").count()
    assert sum(r["n"] for r in rows) == n_corpus
    for r in rows:
        assert 1 <= r["maj_n"] <= r["n"]
        assert r["purity_milli"] == r["maj_n"] * 1000 // r["n"]
        assert r["skew_milli"] == rows[0]["skew_milli"]  # global scalar


def test_serve_context_packs_only_survivors_within_budget(spark):
    kept = {r["vec_id"] for r in rp.pruned_corpus(spark, SF_MED).collect()}
    rows = rp.serve_context(spark, SF_MED).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["vec_id"] in kept
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["serve_rank"])
        assert [r["serve_rank"] for r in rs] == list(range(1, len(rs) + 1))
        cum = 0
        for r in rs:
            cum += r["tok_est"]
            assert r["cum_tok"] == cum
            assert r["kept"] == (cum <= rag.CPK_BUDGET)
        # relevance order is preserved under the survivor filter
        rels = [r["rel_micro"] for r in rs]
        assert rels == sorted(rels, reverse=True)


def test_funnel_stats_one_row_consistent(spark):
    row = rp.rag_funnel_stats(spark, SF_MED).collect()
    assert len(row) == 1
    s = row[0]
    assert 0 < s["n_kept"] < s["n_corpus"]
    assert s["n_chunks"] > s["n_kept"]  # overlap chunking fans out
    assert s["max_cell_skew_milli"] >= 1000
    assert 0 < s["n_graded"]
    assert 0.0 <= s["mean_grounding_milli"] <= 1000.0
