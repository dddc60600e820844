"""Integration test of the end-to-end curation DAG: the registered
(individually oracle-checked) operators composed raw-corpus ->
dedup -> quality gates -> decontamination -> balanced sample, with
the funnel audited stage by stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from py_pubsub_pipeline_spark.curation_pipeline import (
    curated_balanced_sample,
    curation_funnel_stats,
    curation_survivors,
)
from py_pubsub_pipeline_spark.tables import table

from conftest import SF_SMALL


def test_funnel_is_monotone_and_complete(spark):
    n_docs = table(spark, SF_SMALL, "documents").count()
    stats = curation_funnel_stats(spark, SF_SMALL).collect()[0]
    assert stats["n_docs"] == n_docs  # one row per input doc
    # every gate keeps a nonempty, strict-or-equal subset
    for gate in ("n_dedup", "n_repetition", "n_ppl", "n_decontam"):
        assert 0 < stats[gate] <= n_docs
    assert 0 < stats["n_survivors"] <= min(
        stats["n_dedup"], stats["n_repetition"], stats["n_ppl"],
        stats["n_decontam"],
    )
    # the dedup gate must actually drop something on this corpus
    # (the synthetic documents contain near-identical normalizations)
    assert stats["n_survivors"] < n_docs


def test_survivor_flags_are_consistent(spark):
    f = curation_survivors(spark, SF_SMALL)
    bad = f.filter(
        F.col("survives")
        != (
            F.col("pass_dedup")
            & F.col("pass_repetition")
            & F.col("pass_ppl")
            & F.col("pass_decontam")
        )
    ).count()
    assert bad == 0


def test_balanced_sample_is_deterministic_subset(spark):
    sample1 = {
        r.doc_id for r in curated_balanced_sample(spark, SF_SMALL).collect()
    }
    sample2 = {
        r.doc_id for r in curated_balanced_sample(spark, SF_SMALL).collect()
    }
    assert sample1 == sample2  # md5-gated: replay-identical
    survivors = {
        r.doc_id
        for r in curation_survivors(spark, SF_SMALL)
        .filter("survives").collect()
    }
    assert sample1 <= survivors
    assert sample1
