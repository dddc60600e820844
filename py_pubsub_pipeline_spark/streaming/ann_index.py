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
grows by appended partitions, never rewrites.  Round 14 wires the
small-file maintenance the round-13 docstring deferred: ``compact``
folds the committed ``batch=N`` partitions into ONE ``base={through}``
relation (the compact_manifest staging/commit discipline applied to
index state — the same closure round 13 gave the MoR table), after
which ``read_index`` unions the newest base plus only the batch
partitions appended SINCE it, so a months-long ingest reads O(deltas
since compaction) files instead of one per trigger since stream
birth; ``vacuum`` expires the folded partitions.  Correctness is
untouched because the relation stays a plain union and encoding is
per-row deterministic (pytest: read-identity pre/post compaction,
replay-after-compaction convergence, O(1) files for compacted
ranges).

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

    def _bases(self) -> list[int]:
        """Committed compaction bases: ``base={B}`` holds the folded
        codes of every batch id <= B (parquet _SUCCESS is the commit
        marker, same as the batch partitions)."""
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("base=")
            and os.path.exists(os.path.join(self.path, d, "_SUCCESS"))
        )

    def compact(self, spark: SparkSession,
                through: int | None = None) -> str:
        """Fold the committed ``batch=N`` code partitions with
        N <= ``through`` (newest committed batch when None) into ONE
        resolved ``base={through}`` relation — compact_manifest's
        stage-then-commit discipline (sources/io.py) applied to index
        state, and the exact shape MorUpsertSink.compact gave the MoR
        table in round 13.  Incremental: the rewrite reads the newest
        earlier base (if any) plus only the batch partitions after it,
        so repeated maintenance is O(deltas since last compaction),
        never O(stream age).  The folded batch partitions are NOT
        deleted here (``vacuum`` expires them); a replayed folded
        batch rewrites its dir byte-identically and ``read_index``
        ignores it (its id is covered by the base), so at-least-once
        replay around a compaction converges."""
        batches = self._committed()
        bases = self._bases()
        if through is None:
            if not batches:
                if bases:
                    # fully-vacuumed quiescent index: a maintenance
                    # no-op, not an error (read_index serves the base)
                    return f"base={max(bases)}"
                raise FileNotFoundError(
                    f"no committed index batches: {self.path}")
            through = max(batches)
        through = int(through)
        if through in bases:
            # the _SUCCESS marker IS the commit point and the folded
            # content is deterministic — replay is a no-op (and must
            # not rewrite a base a concurrent read may be scanning)
            return f"base={through}"
        prior = max((b for b in bases if b <= through), default=None)
        parts = []
        if prior is not None:
            parts.append(os.path.join(self.path, f"base={prior}"))
        parts += [self._batch_dir(b) for b in batches
                  if b <= through and (prior is None or b > prior)]
        if not parts:
            raise FileNotFoundError(
                f"nothing committed at or below batch {through}: "
                f"{self.path}")
        folded = spark.read.parquet(*parts)
        folded.write.mode("overwrite").parquet(
            os.path.join(self.path, f"base={through}"))
        return f"base={through}"

    def vacuum(self) -> list[str]:
        """Expire index partitions superseded by the newest base: a
        ``batch=N`` dir with N <= base is dead weight (read_index
        never unions it again), as is every older base.  Returns the
        removed relation names.  Safe against replay: a replayed
        folded batch merely recreates a dir the reader ignores, which
        the next vacuum removes again."""
        import shutil

        bases = self._bases()
        if not bases:
            return []
        newest = max(bases)
        dead = [f"batch={b}" for b in self._committed() if b <= newest]
        dead += [f"base={b}" for b in bases if b < newest]
        for rel in dead:
            shutil.rmtree(os.path.join(self.path, rel))
        return dead

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..queries.similarity import _ivfpq_assign, _ivfpq_encode

        res = _ivfpq_assign(batch_df.select("vec_id", "e"), self.cenball)
        enc = _ivfpq_encode(res, self.cbball)
        enc.write.mode("overwrite").parquet(self._batch_dir(epoch_id))

    def read_index(self, spark: SparkSession) -> DataFrame:
        """The committed codes relation — the exact input
        `_ivfpq_search` scans (vec_id, cell, code_0..code_{M-1}).
        Starts from the newest compaction base (which folds every
        batch id <= its seq) and unions only the batch partitions
        appended after it — O(deltas since compaction) files, with
        replayed pre-base batch dirs excluded by construction."""
        from ..queries.similarity import _IVFPQ_CODES_DDL

        bases = self._bases()
        base = max(bases) if bases else None
        out = None
        if base is not None:
            # read the base dir directly (no basePath): its files carry
            # the plain code columns, no inferred partition column.
            # Schema declared (the codes contract shared with
            # _ivfpq_encode) so the serve path skips the per-call
            # parquet footer inference.
            out = spark.read.schema(_IVFPQ_CODES_DDL).parquet(
                os.path.join(self.path, f"base={base}"))
        deltas = [self._batch_dir(b) for b in self._committed()
                  if base is None or b > base]
        if deltas:
            d = (
                spark.read.schema(_IVFPQ_CODES_DDL)
                .option("basePath", self.path)
                .parquet(*deltas).drop("batch")
            )
            out = d if out is None else out.unionByName(d)
        if out is None:
            raise FileNotFoundError(f"no committed index batches: "
                                    f"{self.path}")
        return out
