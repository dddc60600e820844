"""The end-to-end corpus-curation DAG: the registered operators
composed the way a training-data pipeline actually runs them —
normalize -> exact-dedup -> quality gates (repetition + perplexity)
-> decontaminate -> language-balance -> pack.

This is the INTEGRATION surface (exercised in tests/test_curation
_pipeline.py): every stage is one of the oracle-checked registry
queries, so each edge of the DAG is independently verified; what this
module adds is the composition — one declarative plan from raw corpus
to packed sequences, which Catalyst optimizes across stage boundaries
(the per-stage filters all collapse onto the same documents scan).

Scale: every stage is doc_id-keyed; the joins are survivor-set joins
on a single long key, the gates are broadcast- or map-side (see each
operator's own docstring), and nothing here adds a shuffle beyond
what the member operators already carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries.dedup import dedup_exact  # noqa: F401  (same family)
from .queries.quality import sample_importance
from .queries.retrieval import text_perplexity_lm
from .queries.text import text_normalize, text_repetition
from .queries.training import decontaminate_ngram, sample_balanced
from .tables import table

# Perplexity gate: docs whose bigram cross-entropy exceeds the corpus
# mean by this factor are dropped (CCNet keeps the low-ppl tail).
PPL_FACTOR = 1.10


def curation_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_ids surviving the full gate chain, with per-stage flags —
    one row per INPUT doc so the funnel is auditable."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")

    # 1. exact dedup on the normalized text (keep the smallest doc_id
    #    per canonical hash — deterministic canonical choice).
    norm = text_normalize(spark, sf_dir)
    canon = norm.groupBy("norm_hash").agg(
        F.min("doc_id").alias("keep_id")
    )
    dedup_keep = canon.select(F.col("keep_id").alias("doc_id")).withColumn(
        "pass_dedup", F.lit(True)
    )

    # 2. repetition gate (Gopher dup-word / top-bigram fractions) —
    #    the operator already emits its keep verdict.
    rep = text_repetition(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("pass_repetition")
    )

    # 3. perplexity gate: self-trained bigram LM, drop the
    #    high-cross-entropy tail relative to the corpus mean.
    ppl = text_perplexity_lm(spark, sf_dir)
    mean_nll = ppl.agg(F.avg("avg_nll").alias("mu"))
    ppl_gate = ppl.join(F.broadcast(mean_nll)).select(
        "doc_id",
        (F.col("avg_nll") <= PPL_FACTOR * F.col("mu")).alias("pass_ppl"),
    )

    # 4. decontamination: drop docs sharing 8-grams with the eval set.
    contaminated = decontaminate_ngram(spark, sf_dir).select(
        "doc_id", F.lit(False).alias("pass_decontam")
    )

    funnel = (
        d.join(dedup_keep, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(ppl_gate, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("pass_dedup", F.lit(False)).alias("pass_dedup"),
            F.coalesce("pass_repetition", F.lit(True)).alias(
                "pass_repetition"
            ),
            F.coalesce("pass_ppl", F.lit(True)).alias("pass_ppl"),
            F.coalesce("pass_decontam", F.lit(True)).alias(
                "pass_decontam"
            ),
        )
    )
    return funnel.withColumn(
        "survives",
        F.col("pass_dedup")
        & F.col("pass_repetition")
        & F.col("pass_ppl")
        & F.col("pass_decontam"),
    )


def curated_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors put through the language-balancing hash gate — the
    final training-mix selection (deterministic: md5-gated, so rerun,
    repartition, and replay all yield the same set)."""
    survivors = curation_survivors(spark, sf_dir).filter("survives")
    balanced = sample_balanced(spark, sf_dir)
    return survivors.join(balanced, ["doc_id", "lang"], "left_semi").select(
        "doc_id", "lang"
    )


def curation_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: corpus size and survivor counts per gate — the
    auditable funnel report a curation run ships with."""
    f = curation_survivors(spark, sf_dir)
    return f.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("pass_dedup").cast("long")).alias("n_dedup"),
        F.sum(F.col("pass_repetition").cast("long")).alias("n_repetition"),
        F.sum(F.col("pass_ppl").cast("long")).alias("n_ppl"),
        F.sum(F.col("pass_decontam").cast("long")).alias("n_decontam"),
        F.sum(F.col("survives").cast("long")).alias("n_survivors"),
    )
