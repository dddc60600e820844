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
