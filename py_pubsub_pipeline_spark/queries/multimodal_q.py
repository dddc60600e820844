"""Multimodal-column queries: binary payload metadata and the
mapInPandas synthesize→decode→featurize pipeline. BOTH are
oracle-checked since round 2: the decode query synthesizes REAL BMP
files (valid format, any viewer opens them) with dimensions that are
a deterministic function of doc_id/content, then recovers those
dimensions by actually parsing the BMP header bytes in pure stdlib
(multimodal.decode_image_header) — the DuckDB oracle predicts what a
correct parser must recover, so a decode bug fails the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import (
    H_MOD,
    W_MOD,
    decode_and_featurize,
    synthesize_bmp_assets,
)
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


@query(
    "mm_decode_featurize",
    oracle=f"""
    SELECT doc_id AS asset_id,
           'image/bmp' AS media_type,
           CAST(1 + doc_id % {W_MOD} AS INT) AS width,
           CAST(1 + octet_length(encode(text)) % {H_MOD} AS INT) AS height,
           CAST(24 AS INT) AS bpp,
           CAST(54 + ((1 + doc_id % {W_MOD}) * 3 + 3) // 4 * 4
                * (1 + octet_length(encode(text)) % {H_MOD}) AS BIGINT)
             AS n_bytes
    FROM documents
    """,
)
def mm_decode_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched synthesize→decode→featurize over binary image
    assets (mapInPandas end to end). Every document becomes a real
    24-bit BMP (width = 1 + doc_id % {W_MOD}, height = 1 +
    content_bytes % {H_MOD}, pixels from the document bytes); the
    decode stage recovers width/height/bpp by PARSING THE HEADER BYTES
    — the oracle predicts the same values independently, so the hash
    match verifies the decoder, not the synthesizer alone. n_bytes
    checks the full file layout (54-byte headers + 4-byte-aligned
    pixel rows)."""
    docs = table(spark, sf_dir, "documents")
    decoded = decode_and_featurize(synthesize_bmp_assets(docs))
    return decoded.select(
        "asset_id", "media_type", "width", "height", "bpp", "n_bytes"
    )
