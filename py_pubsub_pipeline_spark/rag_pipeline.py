"""The end-to-end RAG corpus-to-context DAG: the round-8 registered
operators composed the way a retrieval pipeline actually runs them —
semantic-prune the corpus -> chunk the survivors for the index ->
audit index health (cell balance x label purity) -> retrieve and
budget-pack the context, serving only non-pruned passages.

This is the INTEGRATION surface (exercised in
tests/test_rag_pipeline.py), the retrieval-side sibling of
curation_pipeline.py: every stage is one of the oracle-checked
registry queries, so each edge of the DAG is independently verified;
what this module adds is the composition — survivor joins on a single
long key, re-ranks only over already-bounded pools, and one health
report the index build gates on.

Scale: the prune verdict and pack pool are the member operators'
own bounded/blocked plans; the composition's joins are key-only
(vec_id/doc_id/cell) and the re-pack window runs over queries x
pool-size rows.  Nothing here adds a shuffle beyond what the member
operators already carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries.rag import (
    CPK_BUDGET,
    dedup_semantic_prune,
    rag_context_pack,
    rag_grounding_overlap,
    text_chunk_overlap,
)
from .queries.similarity import emb_cluster_purity, sim_ivf_balance
from .tables import table


def pruned_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectors surviving semantic pruning (SemDeDup keep rule), with
    the verdict columns kept for the funnel audit."""
    verdicts = dedup_semantic_prune(spark, sf_dir)
    return verdicts.filter(F.col("kept")).select("vec_id", "bkt", "n_close")


def chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk table the indexer would embed: sliding-window chunks
    of the PRUNED documents only (doc_id and vec_id share the id
    space on this corpus — the survivor join is one key-only
    semi-join on the chunk stream)."""
    kept = pruned_corpus(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id")
    )
    return text_chunk_overlap(spark, sf_dir).join(kept, "doc_id", "semi")


def index_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per IVF cell: size, corpus share, global skew, and
    majority-label purity — the report an index build gates on
    (re-train centroids when skew spikes; distrust labels-as-
    relevance when purity collapses)."""
    bal = sim_ivf_balance(spark, sf_dir)
    pur = emb_cluster_purity(spark, sf_dir).select(
        "cell", "maj_label", "maj_n", "purity_milli"
    )
    return bal.join(pur, "cell").select(
        "cell", "n", "share_milli", "skew_milli",
        "maj_label", "maj_n", "purity_milli",
    )


def serve_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed context, restricted to passages that SURVIVED the
    prune: the member operator's pool drops its pruned rows, then the
    running token budget re-packs over the survivors (a window over
    queries x pool-size rows).  Emits one row per surviving pool
    passage with its re-packed rank, cumulative tokens, and verdict."""
    kept = pruned_corpus(spark, sf_dir).select("vec_id")
    pool = rag_context_pack(spark, sf_dir).join(kept, "vec_id", "semi")
    w = Window.partitionBy("query_id").orderBy("pack_rank")
    cum = Window.partitionBy("query_id").orderBy("pack_rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return pool.select(
        "query_id", "vec_id", "rel_micro", "tok_est",
        F.row_number().over(w).alias("serve_rank"),
        F.sum("tok_est").over(cum).alias("cum_tok"),
    ).withColumn("kept", F.col("cum_tok") <= CPK_BUDGET)


def rag_funnel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit of the whole DAG: corpus size, prune survivors,
    indexed chunks, worst cell skew, mean packed-context grounding —
    the funnel a retrieval-quality dashboard plots per corpus drop."""
    n_corpus = table(spark, sf_dir, "embeddings").count()
    n_kept = pruned_corpus(spark, sf_dir).count()
    n_chunks = chunk_index(spark, sf_dir).count()
    health = index_health(spark, sf_dir)
    skew = health.agg(F.max("skew_milli").alias("s")).collect()[0]["s"]
    served = serve_context(spark, sf_dir).filter("kept")
    grounded = served.join(
        rag_grounding_overlap(spark, sf_dir).select(
            "query_id", "vec_id", "grounding_milli"
        ),
        ["query_id", "vec_id"],
    )
    g = grounded.agg(
        F.avg("grounding_milli").alias("mean_grounding_milli"),
        F.count(F.lit(1)).alias("n_graded"),
    ).collect()[0]
    return spark.createDataFrame(
        [(
            n_corpus, n_kept, n_chunks, skew,
            int(g["n_graded"]),
            float(g["mean_grounding_milli"] or 0.0),
        )],
        "n_corpus long, n_kept long, n_chunks long, max_cell_skew_milli "
        "long, n_graded long, mean_grounding_milli double",
    )
