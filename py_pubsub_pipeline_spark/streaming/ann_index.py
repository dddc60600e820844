"""Streaming IVF-PQ INDEX MAINTENANCE (round 13): the serving ladder's
missing write path.

The ANN keys serve off a codes relation materialized once per corpus
(the FAISS persist-the-index discipline, queries/similarity.py) — but
a production corpus is INGESTED, not given: new vectors arrive in
micro-batches and must enter the index without rebuilding it.  FAISS
separates `train` (fix the codebooks) from `add` (encode new vectors
against the FIXED codebooks); this sink is `add` as a foreachBatch
stage:

  - per trigger, the batch's vectors route + encode MAP-SIDE against
    the one-row broadcast coarse-centroid array and residual codebook
    (the same `_ivfpq_assign` / code-expr arithmetic every search key
    uses — encoding is per-row deterministic, so a streamed index is
    VALUE-IDENTICAL to a batch-built one over the same vectors);
  - the 10-int-per-vector codes land as a batch-id-keyed partition
    (overwrite mode + parquet _SUCCESS commit marker), so the
    at-least-once replay window converges byte-identically — the
    IdempotentParquetSink discipline applied to index state;
  - `read_index` unions the committed partitions: exactly the codes
    relation `_ivfpq_search` scans, so search-over-streamed-index is
    the registered plan with a different provenance.

Scale: per-trigger cost is O(batch) encode work (two broadcast
crossJoins against one-row codebook tables — no shuffle); the index
grows by appended partitions, never rewrites; compaction of many
small batch partitions into larger files is ordinary parquet-file
maintenance (`compact_files` / `compact_manifest`, sources/io.py),
orthogonal to correctness because the relation is a plain union.

Reference anchor: this is the pipeline's R9/R10 publish-then-commit
shape (pubsub_pipeline.py:48-52 ack-after-publish) applied to index
artifacts instead of messages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class IvfpqIndexSink:
    """foreachBatch sink that appends IVF-PQ codes for each arriving
    vector batch, encoding against FIXED (trained or sample-init)
    codebooks supplied at construction — FAISS's `add` phase.

    ``cenball``: one-row DataFrame with a ``cents`` array of
    (cid, ce) structs (``_ivfpq_cenball``'s output).
    ``cbball``: one-row DataFrame with the ``cb[m][k]`` nested
    residual-codebook array (``_ivfpq_cb_init`` / ``_ivfpq_cb_train``
    output, or a fixture read).
    """

    def __init__(self, path: str, cenball: DataFrame, cbball: DataFrame):
        self.path = path
        self.cenball = cenball
        self.cbball = cbball

    def _batch_dir(self, epoch_id: int) -> str:
        return os.path.join(self.path, f"batch={int(epoch_id)}")

    def _committed(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("batch=")
            and os.path.exists(os.path.join(self.path, d, "_SUCCESS"))
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..queries.similarity import _ivfpq_assign, _ivfpq_encode

        res = _ivfpq_assign(batch_df.select("vec_id", "e"), self.cenball)
        enc = _ivfpq_encode(res, self.cbball)
        enc.write.mode("overwrite").parquet(self._batch_dir(epoch_id))

    def read_index(self, spark: SparkSession) -> DataFrame:
        """The committed codes relation — the exact input
        `_ivfpq_search` scans (vec_id, cell, code_0..code_{M-1})."""
        dirs = [self._batch_dir(b) for b in self._committed()]
        if not dirs:
            raise FileNotFoundError(f"no committed index batches: "
                                    f"{self.path}")
        return (
            spark.read.option("basePath", self.path).parquet(*dirs)
            .drop("batch")
        )
