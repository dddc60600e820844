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
    FRAME_MOD,
    PH_BITS,
    PH_H_MOD,
    PH_SHIFT,
    PH_W_MOD,
    phash_dedup_assets,
    H_MOD,
    SAMPLE_RATES,
    VID_F_MOD,
    VID_H_MOD,
    VID_SAMPLE_EVERY,
    VID_W_MOD,
    W_MOD,
    decode_and_featurize,
    decode_audio,
    decode_png_assets,
    decode_video_framesample,
    synthesize_bmp_assets,
    synthesize_png_assets,
    synthesize_y4m_assets,
    synthesize_wav_assets,
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


@query(
    "mm_png_decode",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             octet_length(encode(text)) AS L,
             1 + doc_id % {W_MOD} AS w,
             1 + octet_length(encode(text)) % {H_MOD} AS h
      FROM documents),
    px AS (
      -- GREATEST(L, 1): an empty document would make j % L a modulo
      -- by zero; with L=1 substr('',1,1)='' and ascii('')=0, matching
      -- encode_png's b'\\x00' pixel fallback (sum_px = 0)
      SELECT doc_id,
             ascii(substr(text, CAST(j % GREATEST(L, 1) AS INT) + 1, 1)) AS v
      FROM b, UNNEST(generate_series(0, 3 * w * h - 1)) t(j)),
    agg AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sum_px
            FROM px GROUP BY doc_id)
    SELECT b.doc_id AS asset_id, 'image/png' AS media_type,
           CAST(b.w AS INT) AS width, CAST(b.h AS INT) AS height,
           CAST(24 AS INT) AS bpp, a.sum_px
    FROM b JOIN agg a ON a.doc_id = b.doc_id
    """,
)
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG-column pipeline, oracle-checked at the PIXEL level: every
    document becomes a REAL 8-bit RGB PNG (zlib IDAT split across two
    chunks; scanline y filtered with type y % 5, so all five PNG
    filters appear), then the decode stage walks chunks, checks CRCs,
    inflates, and UN-FILTERS to recover the raw pixels. The oracle
    reconstructs the expected pixel-byte sum arithmetically from the
    text bytes (pixels = document bytes cycled to 3*w*h; the corpus is
    ASCII so ascii(substr(..)) IS the byte) — a decoder that skips
    un-filtering, drops an IDAT chunk, or misparses chunk boundaries
    hash-mismatches. This closes the PNG gap: of the image stack only
    JPEG (DCT entropy coding) still needs a codec library."""
    docs = table(spark, sf_dir, "documents")
    return decode_png_assets(synthesize_png_assets(docs))


@query(
    "mm_audio_decode",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, length(text) AS L,
             1 + length(text) % {FRAME_MOD} AS n_frames,
             CAST(CASE doc_id % 3 WHEN 0 THEN {SAMPLE_RATES[0]}
                                  WHEN 1 THEN {SAMPLE_RATES[1]}
                                  ELSE {SAMPLE_RATES[2]} END AS INT)
               AS sample_rate
      FROM documents),
    samp AS (
      SELECT doc_id,
             (ascii(substr(text, ((2*k) % L) + 1, 1))
                + CASE WHEN (2*k) % 3 = 1 THEN 128 ELSE 0 END)
             + 256 * (ascii(substr(text, ((2*k+1) % L) + 1, 1))
                + CASE WHEN (2*k+1) % 3 = 1 THEN 128 ELSE 0 END) AS x
      FROM b, UNNEST(generate_series(0, n_frames - 1)) t(k)),
    agg AS (
      SELECT doc_id,
             CAST(SUM(ABS(CASE WHEN x < 32768 THEN x ELSE x - 65536 END))
                  AS BIGINT) AS sum_abs
      FROM samp GROUP BY doc_id)
    SELECT b.doc_id AS asset_id, 'audio/wav' AS media_type, b.sample_rate,
           CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits,
           CAST(b.n_frames AS BIGINT) AS n_frames, a.sum_abs
    FROM b JOIN agg a ON a.doc_id = b.doc_id
    """,
)
def mm_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-column pipeline, oracle-checked end to end: every
    document becomes a REAL 16-bit mono PCM WAV (RIFF with a LIST
    chunk between fmt and data, samples from document bytes with every
    third stream byte bit-flipped so ~1/3 of samples are negative);
    the decode stage walks the RIFF chunks, parses fmt, and sums
    |sample| over the signed PCM data. The oracle reconstructs the
    same sample stream arithmetically from the text bytes (the corpus
    is ASCII: ascii(substr(..)) IS the byte), so a decoder that skips
    the LIST chunk wrong, assumes data at offset 44, or reads samples
    unsigned all hash-mismatch — this verifies the decoder at the
    SAMPLE level, not just the header."""
    docs = table(spark, sf_dir, "documents")
    return decode_audio(synthesize_wav_assets(docs))


@query(
    "mm_video_framesample",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text,
             octet_length(encode(text)) AS L,
             2 + doc_id % {VID_W_MOD} AS w,
             2 + (doc_id // {VID_W_MOD}) % {VID_H_MOD} AS h,
             1 + octet_length(encode(text)) % {VID_F_MOD} AS n_frames
      FROM documents),
    px AS (
      -- stream position j cycles the document bytes; frame f = j //
      -- (3*w*h); sampled frames are f % {VID_SAMPLE_EVERY} = 0
      SELECT doc_id,
             ascii(substr(text, CAST(j % GREATEST(L, 1) AS INT) + 1, 1))
               AS v
      FROM b, UNNEST(generate_series(0, n_frames * 3 * w * h - 1)) t(j)
      WHERE (j // (3 * w * h)) % {VID_SAMPLE_EVERY} = 0),
    agg AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sum_px
            FROM px GROUP BY doc_id)
    SELECT b.doc_id AS asset_id, 'video/x-yuv4mpeg' AS media_type,
           CAST(b.w AS INT) AS width, CAST(b.h AS INT) AS height,
           CAST(b.n_frames AS INT) AS n_frames,
           CAST((b.n_frames + {VID_SAMPLE_EVERY} - 1)
                // {VID_SAMPLE_EVERY} AS INT) AS n_sampled,
           a.sum_px
    FROM b JOIN agg a ON a.doc_id = b.doc_id
    """,
)
def mm_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-column pipeline, oracle-checked at the PIXEL level: every
    document becomes a REAL YUV4MPEG2 stream (text header + FRAME
    markers + C444 planes — ffmpeg opens it), then the decode stage
    parses the header, walks the FRAME markers, and samples every
    {VID_SAMPLE_EVERY}nd frame, summing the sampled plane bytes. The
    oracle reconstructs geometry, frame count, sample count, and the
    sampled-pixel sum arithmetically from the text bytes (ASCII corpus:
    ascii(substr(..)) IS the byte), so a walker that drifts out of
    frame alignment or samples the wrong frames hash-mismatches.

    This completes the multimodal triad (image / audio / video). The
    Spark-side plumbing — BINARY payload column, typed metadata,
    Arrow-batched mapInPandas with constant memory per batch — is the
    real 100 TB shape; a GPU/codec featurizer slots into the same
    mapInPandas seam."""
    docs = table(spark, sf_dir, "documents")
    return decode_video_framesample(synthesize_y4m_assets(docs))


@query(
    "mm_image_dedup_ahash",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, octet_length(encode(text)) AS L,
             1 + octet_length(encode(text)) % {PH_W_MOD} AS w,
             1 + (octet_length(encode(text)) // 7) % {PH_H_MOD} AS h
      FROM documents),
    px AS (
      SELECT doc_id,
             CAST(j * {PH_BITS} // (3 * w * h) AS INT) AS blk,
             ascii(substr(text, CAST(j % GREATEST(L, 1) AS INT) + 1, 1)) AS v
      FROM b, UNNEST(generate_series(0, 3 * w * h - 1)) t(j)),
    bs AS (SELECT doc_id, blk, SUM(v) AS s, COUNT(*) AS n
           FROM px GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(s) AS ts, SUM(n) AS tn FROM bs GROUP BY 1),
    hashes AS (
      SELECT bs.doc_id,
             CAST(SUM(CASE WHEN bs.s * tot.tn > tot.ts * bs.n
                           THEN 1::BIGINT << bs.blk ELSE 0 END)
                  AS BIGINT) AS ahash
      FROM bs JOIN tot ON tot.doc_id = bs.doc_id GROUP BY bs.doc_id)
    SELECT CAST(b.w AS INT) AS width, CAST(b.h AS INT) AS height,
           hsh.ahash,
           CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_docs,
           CAST(2 * COUNT(*) AS BIGINT) AS n_assets
    FROM b JOIN hashes hsh ON hsh.doc_id = b.doc_id
    GROUP BY b.w, b.h, hsh.ahash
    """,
)
def mm_image_dedup_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: every document becomes TWO real BMPs —
    the original and a +{PH_SHIFT} uniformly BRIGHTENED copy (byte-
    different, so content-md5 dedup misses the pair) — each asset runs
    encode -> REAL pixel decode (header parse, stride/padding strip,
    top-down flag) -> 16-block average-hash, and assets cluster on
    (dims, aHash). The aHash threshold compares in exact integer
    arithmetic, making it provably invariant to uniform brightness
    shift — so each doc's two assets MUST land in one cluster
    (n_assets = 2*n_docs in every row is the built-in self-check the
    oracle enforces), while byte-identical documents collapse across
    doc_ids. The oracle reconstructs every hash arithmetically from
    the text bytes — a decoder that misreads stride, padding, or row
    order hash-mismatches.

    Scale: one Arrow-batched mapInPandas pass (constant memory per
    batch), then a hash agg on (w, h, ahash) — candidate clustering
    shuffles ONE 16-bit-hash row per asset, never pixels; the same
    banding trick as dedup_minhash_lsh applies for近-dup within
    Hamming distance if needed (split the 16 bits into bands)."""
    docs = table(spark, sf_dir, "documents")
    assets = phash_dedup_assets(docs)
    return assets.groupBy(
        F.col("width"), F.col("height"), F.col("ahash")
    ).agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_assets"),
    )


@query(
    "mm_audio_energy_zcr",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, length(text) AS L,
             1 + length(text) % {FRAME_MOD} AS n_frames
      FROM documents),
    samp AS (
      SELECT doc_id, k,
             (ascii(substr(text, ((2*k) % L) + 1, 1))
                + CASE WHEN (2*k) % 3 = 1 THEN 128 ELSE 0 END)
             + 256 * (ascii(substr(text, ((2*k+1) % L) + 1, 1))
                + CASE WHEN (2*k+1) % 3 = 1 THEN 128 ELSE 0 END) AS u
      FROM b, UNNEST(generate_series(0, n_frames - 1)) t(k)),
    signed_s AS (
      SELECT doc_id, k,
             CASE WHEN u < 32768 THEN u ELSE u - 65536 END AS x
      FROM samp),
    feat AS (
      SELECT doc_id,
             COUNT(*) AS n_samples,
             SUM(CASE WHEN prev_neg IS NOT NULL
                       AND (x < 0) != prev_neg THEN 1 ELSE 0 END)
               AS zc,
             SUM(x * x) AS energy
      FROM (
        SELECT doc_id, x,
               LAG(x < 0) OVER (PARTITION BY doc_id ORDER BY k)
                 AS prev_neg
        FROM signed_s
      ) GROUP BY doc_id)
    SELECT doc_id AS asset_id,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(zc AS BIGINT) AS zero_crossings,
           CAST(energy AS BIGINT) AS energy,
           FLOOR(sqrt(CAST(energy AS DOUBLE) / n_samples)
                 * 1000000 + 0.5) / 1000000 AS rms
    FROM feat
    """,
)
def mm_audio_energy_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO FEATURE EXTRACTION — the step after decode that
    mm_decode_featurize does for images: per-asset RMS ENERGY
    (loudness) and ZERO-CROSSING RATE (the classic no-FFT
    voiced/unvoiced + noisiness discriminant) over the real PCM
    sample stream, via the same Arrow-batched RIFF chunk walker as
    mm_audio_decode. The oracle reconstructs the identical sample
    stream arithmetically (corpus bytes are ASCII) and replays the
    sign-flip count and the exact integer energy — so the features
    are verified at the SAMPLE level: a decoder that drops the last
    odd sample, mis-signs PCM, or counts a zero sample as negative
    hash-mismatches.

    Scale: mapInPandas with Arrow batches (the sanctioned Python
    path for binary media), one Python call per batch; features are
    per-asset scalars so nothing but (id, 4 numbers) leaves the
    stage. Energy stays exact BIGINT; rms is one IEEE sqrt + round,
    identical on both engines."""
    docs = table(spark, sf_dir, "documents")
    from ..multimodal import audio_features, synthesize_wav_assets

    return audio_features(synthesize_wav_assets(docs))
