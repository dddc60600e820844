"""Multimodal-column queries: binary payload metadata (oracle-checked)
and the mapInPandas decode/featurize pipeline (rows-only — the decode
kernel is a deterministic fake, see multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_and_featurize, documents_as_assets
from ..registry import query
from ..tables import table


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id AS asset_id,
           octet_length(encode(text)) AS n_bytes,
           substr(hex(encode(text)), 1, 8) AS head_hex,
           md5(text) AS content_md5
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload handling: byte length, magic-bytes head, content
    hash — all computed on the BINARY column JVM-side."""
    d = table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.length(payload).cast("long").alias("n_bytes"),
        # first 4 payload bytes as hex (sliced on the hex string — DuckDB
        # has no BLOB substring)
        F.substring(F.hex(payload), 1, 8).alias("head_hex"),
        F.md5(payload).alias("content_md5"),
    )


@query("mm_decode_featurize", oracle=None)  # Python kernel: rows-only check
def mm_decode_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature/resize pipeline over binary assets
    (mapInPandas; deterministic fake decode kernel)."""
    docs = table(spark, sf_dir, "documents")
    return decode_and_featurize(documents_as_assets(docs))
