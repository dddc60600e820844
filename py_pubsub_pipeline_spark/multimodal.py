"""Multimodal columns: opaque binary payloads + typed metadata.

Reference parity: the reference treats every payload as opaque bytes
with pluggable codecs (/root/reference/pubsub_pipeline.py:177 raw
`message.data`; :66-67 pluggable deserializer/serializer) — this
module is that same opaque-bytes contract extended to media, where
the "codec" is a decode/featurize kernel instead of JSON.

The pattern (SURVEY.md §2B): media travel as BINARY columns next to a
metadata struct; decode/feature-extraction runs as Arrow-batched
Pandas iterators (mapInPandas) so each Python call sees a columnar
batch, never a row. The decode kernels themselves are STUBBED here
(no image/audio libs in this container — clearly marked below); the
Spark-side plumbing — schema, batch shape, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Schema contract for a multimodal asset row.
ASSET_SCHEMA = (
    "asset_id LONG, payload BINARY, media_type STRING, "
    "meta STRUCT<width: INT, height: INT, n_bytes: LONG>"
)

DECODED_SCHEMA = (
    "asset_id LONG, media_type STRING, n_bytes LONG, "
    "feature_norm DOUBLE, thumb_bytes LONG"
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as binary assets (the corpus carries no
    real media; text bytes stand in as the opaque payload — the schema
    and plumbing are what production reuses)."""
    payload = F.col("text").cast("binary")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_image(payload: bytes) -> Any:
    """STUB: real implementation needs an image codec (PIL/cv2 — not in
    this container). Raises so accidental use is loud."""
    raise NotImplementedError("image decode requires an image codec library")


def _fake_feature(payload: bytes) -> float:
    """Deterministic stand-in feature: mean byte value. Replaces the
    embedding-model call so batch plumbing is testable hermetically."""
    return sum(payload) / len(payload) if payload else 0.0


def decode_and_featurize(assets: DataFrame, thumb_max: int = 64) -> DataFrame:
    """The mapInPandas decode/feature/resize pipeline: one Arrow batch
    per Python call; per-batch vectorized work; constant memory.
    Decode is faked deterministically (see _fake_feature)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in payloads],
                    "feature_norm": [_fake_feature(p) for p in payloads],
                    # 'resize': keep at most thumb_max bytes of payload
                    "thumb_bytes": [min(len(p), thumb_max) for p in payloads],
                }
            )

    return assets.mapInPandas(run, DECODED_SCHEMA)
