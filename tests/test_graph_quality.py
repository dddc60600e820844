"""Unit tests for the reusable graph/quality library pieces:
connected_components as a function (the dedup_cc query is its
oracle-checked integration test) and the stability contract of
hash-gated sampling/splits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from py_pubsub_pipeline_spark.queries.graph import (
    connected_components,
    connected_components_star,
)
from py_pubsub_pipeline_spark.queries.quality import (
    _SPLIT_GATE,
    sample_hash,
    split_train_test,
)
from py_pubsub_pipeline_spark.tables import table

from conftest import SF_SMALL


def _cc(spark, vertices, edge_pairs):
    v = spark.createDataFrame([(x,) for x in vertices], "doc_id long")
    e = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] + [(b, a) for a, b in edge_pairs],
        "u long, v long",
    )
    rows = connected_components(v, e).collect()
    return {r.doc_id: r.component for r in rows}


def test_cc_chain_converges_past_one_hop(spark):
    # A 6-vertex path: min label must propagate the full diameter,
    # not just one hop.
    got = _cc(spark, range(10, 16), [(i, i + 1) for i in range(10, 15)])
    assert got == {i: 10 for i in range(10, 16)}


def test_cc_two_components_and_singleton(spark):
    got = _cc(spark, [1, 2, 3, 7, 8, 99], [(1, 2), (2, 3), (7, 8)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 99: 99}


def test_cc_cycle(spark):
    got = _cc(spark, [4, 5, 6], [(4, 5), (5, 6), (6, 4)])
    assert got == {4: 4, 5: 4, 6: 4}


def _cc_star(spark, vertices, edge_pairs, stats=None):
    v = spark.createDataFrame([(x,) for x in vertices], "doc_id long")
    e = spark.createDataFrame(
        list(edge_pairs) or [(None, None)], "u long, v long"
    ).dropna()
    rows = connected_components_star(v, e, stats=stats).collect()
    return {r.doc_id: r.component for r in rows}


def test_star_cc_agrees_with_min_label_on_random_graphs(spark):
    """Property: the two formulations are independent implementations
    of the same semantics — they must produce identical labelings on
    random graphs (seeded Erdős–Rényi, several densities)."""
    import random

    for seed, p in [(0, 0.02), (1, 0.06), (2, 0.15), (3, 0.5)]:
        rng = random.Random(seed)
        n = 40
        verts = list(range(n))
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < p
        ]
        star = _cc_star(spark, verts, edges)
        minlabel = _cc(spark, verts, edges)
        assert star == minlabel, (seed, p)


def test_star_cc_long_chain_converges_in_log_rounds(spark):
    """The adversarial case for min-label (rounds = diameter): a
    200-vertex path. Star CC must converge in O(log^2 n) rounds —
    far under the diameter — and label everything with the chain min."""
    n = 200
    stats: dict = {}
    got = _cc_star(
        spark, range(n), [(i, i + 1) for i in range(n - 1)], stats=stats
    )
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 12, stats  # diameter would be ~200


def test_min_label_cc_raises_rather_than_returning_partial_labels(spark):
    """ADVICE r1: exceeding the round budget must fail loudly, never
    return silently-wrong components."""
    import pytest

    v = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    pairs = [(i, i + 1) for i in range(29)]
    e = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "u long, v long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(v, e, max_rounds=3)


def test_sample_membership_stable_under_repartition(spark):
    # The sampled id set must be a pure function of the data, not the
    # partitioning (the property rand()-based sampling lacks).
    base = {r.o_orderkey for r in sample_hash(spark, SF_SMALL).collect()}
    o = table(spark, SF_SMALL, "orders").repartition(7, "o_custkey")
    resampled = {
        r.o_orderkey
        for r in o.filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
        ).collect()
    }
    assert base == resampled
    n_total = table(spark, SF_SMALL, "orders").count()
    assert 0.05 < len(base) / n_total < 0.17  # ~10% gate


def test_split_is_exhaustive_and_disjoint(spark):
    rows = {r.split: r.n for r in split_train_test(spark, SF_SMALL).collect()}
    n_total = table(spark, SF_SMALL, "orders").count()
    assert set(rows) == {"train", "test"}
    assert rows["train"] + rows["test"] == n_total
    assert 0.7 < rows["train"] / n_total < 0.9  # ~80% gate
    assert int(_SPLIT_GATE, 16) / 256 == 0.796875


def test_prefix_filter_pairs_equal_full_inverted_index_join(spark):
    # The prefix filter is LOSSLESS for Jaccard >= t: the verified
    # pair set must equal dedup_ngram_jaccard's exactly (same docs,
    # same jaccard values).
    from py_pubsub_pipeline_spark.queries.dedup import (
        dedup_ngram_jaccard,
        dedup_prefix_filter,
    )

    full = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in dedup_ngram_jaccard(spark, SF_SMALL).collect()
    }
    pref = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in dedup_prefix_filter(spark, SF_SMALL).collect()
    }
    assert pref == full
    assert len(pref) > 0  # non-vacuous at this scale


def test_prefix_filter_candidates_prune_vs_full_join(spark):
    # The point of the prefix index: candidate pairs (pre-verify)
    # must be a strict subset of the pairs the full inverted index
    # generates, on any corpus where common shingles exist.
    from py_pubsub_pipeline_spark.queries.dedup import (
        _hashed_shingles,
    )
    from pyspark.sql import Window

    sh = _hashed_shingles(spark, SF_SMALL)
    full_cand = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    dfreq = sh.groupBy("h").agg(F.count("*").alias("df"))
    wr = Window.partitionBy("doc_id").orderBy("df", "h")
    wn = Window.partitionBy("doc_id")
    pref = (
        sh.join(dfreq, "h")
        .select(
            "doc_id", "h",
            F.row_number().over(wr).alias("r"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("r") <= F.expr("n - (n + 1) DIV 2 + 1"))
    )
    pref_cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.greatest(F.col("a.n"), F.col("b.n"))
                <= 2 * F.least(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    assert 0 < pref_cand < full_cand


def test_leakage_safe_split_has_zero_cross_pairs_where_doc_split_leaks(spark):
    from py_pubsub_pipeline_spark.queries.dedup import dedup_ngram_jaccard
    from py_pubsub_pipeline_spark.queries.graph import split_leakage_safe

    rows = split_leakage_safe(spark, SF_SMALL).collect()
    assert {r.split for r in rows} == {"train", "test"}
    assert all(r.cross_split_pairs == 0 for r in rows)
    docs = table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_docs for r in rows) == docs  # exhaustive + disjoint
    # The audit is non-vacuous: a DOC-level hash split over the same
    # pair graph does leak (some pair straddles the gate) — proving
    # the zero above is earned by the component construction.
    pairs = dedup_ngram_jaccard(spark, SF_SMALL).select("a_id", "b_id")
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cc"
    doc_split = table(spark, SF_SMALL, "documents").select(
        "doc_id",
        F.when(gate, F.lit("train")).otherwise(F.lit("test")).alias("s"),
    )
    leaked = (
        pairs.join(
            doc_split.select(F.col("doc_id").alias("a_id"),
                             F.col("s").alias("sa")), "a_id")
        .join(
            doc_split.select(F.col("doc_id").alias("b_id"),
                             F.col("s").alias("sb")), "b_id")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaked > 0


def test_ppjoin_pairs_equal_full_join_and_prune_tighter(spark):
    # Positional filter is lossless (released pairs == the full
    # inverted-index join's) and admits no more candidates than the
    # prefix filter alone.
    from py_pubsub_pipeline_spark.queries.dedup import (
        _hashed_shingles,
        _prefix_ranked,
        dedup_ngram_jaccard,
        dedup_ppjoin,
    )
    from pyspark.sql import Window

    full = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in dedup_ngram_jaccard(spark, SF_SMALL).collect()
    }
    pp = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in dedup_ppjoin(spark, SF_SMALL).collect()
    }
    assert pp == full
    sh = _hashed_shingles(spark, SF_SMALL)
    pref = _prefix_ranked(sh).filter(
        F.col("r") <= F.expr("n - (n + 1) DIV 2 + 1")
    )
    a, b = pref.alias("a"), pref.alias("b")
    hits = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (
            F.greatest(F.col("a.n"), F.col("b.n"))
            <= 2 * F.least(F.col("a.n"), F.col("b.n"))
        ),
    ).select(
        F.col("a.doc_id").alias("a_id"),
        F.col("b.doc_id").alias("b_id"),
        F.col("a.n").alias("na"), F.col("b.n").alias("nb"),
        F.col("a.r").alias("i"), F.col("b.r").alias("j"),
    )
    prefix_cands = hits.select("a_id", "b_id").distinct().count()
    wfirst = Window.partitionBy("a_id", "b_id").orderBy("i", "j")
    pp_cands = (
        hits.withColumn("fh", F.row_number().over(wfirst))
        .filter(
            (F.col("fh") == 1)
            & (F.col("na") + F.col("nb")
               <= 3 * (1 + F.least(F.col("na") - F.col("i"),
                                   F.col("nb") - F.col("j"))))
        )
        .count()
    )
    assert 0 < pp_cands <= prefix_cands


def test_cc_star_key_matches_min_label_key_on_corpus(spark):
    from py_pubsub_pipeline_spark.queries.graph import (
        dedup_cc,
        dedup_cc_star,
    )

    base = {(r.doc_id, r.component)
            for r in dedup_cc(spark, SF_SMALL).collect()}
    star = {(r.doc_id, r.component)
            for r in dedup_cc_star(spark, SF_SMALL).collect()}
    assert star == base
