"""Unit tests for the pure-stdlib image codecs: the synthesize/decode
round trip must recover exactly the encoded geometry, and formats
needing a real codec library must fail loudly (never silently wrong).
"""

from __future__ import annotations

import pytest

from py_pubsub_pipeline_spark.multimodal import (
    decode_image_header,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
)


@pytest.mark.parametrize("w,h", [(1, 1), (13, 7), (640, 480), (3, 100)])
def test_bmp_roundtrip_recovers_geometry(w, h):
    payload = encode_bmp(w, h, b"some pixel source material")
    fmt, gw, gh, bpp = decode_image_header(payload)
    assert (fmt, gw, gh, bpp) == ("bmp", w, h, 24)
    # file layout: 54-byte headers + 4-byte-aligned rows
    assert len(payload) == 54 + ((w * 3 + 3) // 4) * 4 * h


@pytest.mark.parametrize("w,h", [(1, 1), (12, 34), (640, 480)])
def test_ppm_roundtrip_recovers_geometry(w, h):
    payload = encode_ppm(w, h, b"\x01\x02\x03")
    fmt, gw, gh, bpp = decode_image_header(payload)
    assert (fmt, gw, gh, bpp) == ("ppm", w, h, 24)
    assert payload.startswith(b"P6\n")


def test_bmp_empty_pixel_source_is_valid():
    fmt, w, h, _ = decode_image_header(encode_bmp(2, 2, b""))
    assert (fmt, w, h) == ("bmp", 2, 2)


def test_top_down_bmp_height_normalized():
    # A negative height means top-down row order; decoders must report
    # the magnitude.
    import struct

    payload = bytearray(encode_bmp(4, 3, b"x"))
    struct.pack_into("<i", payload, 22, -3)
    fmt, w, h, _ = decode_image_header(bytes(payload))
    assert (w, h) == (4, 3)


def test_jpeg_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="image codec library"):
        decode_image_header(b"\xff\xd8\xff\xe0rest-of-jpeg")


@pytest.mark.parametrize("w,h", [(1, 1), (13, 7), (5, 6), (3, 100)])
def test_png_roundtrip_recovers_geometry_and_pixels(w, h):
    src = b"the quick brown fox \x01\x02\xfe"
    payload = encode_png(w, h, src)
    gw, gh, bpp, sum_px = decode_png(payload)
    assert (gw, gh, bpp) == (w, h, 24)
    raw = (src * (3 * w * h // len(src) + 1))[: 3 * w * h]
    assert sum_px == sum(raw)  # un-filtered pixels, not filtered bytes
    assert decode_image_header(payload) == ("png", w, h, 24)


def test_png_decoder_exercises_all_five_filters():
    # 5+ rows => scanlines carry filter types 0..4; a decoder that
    # returns filtered bytes unmodified gets the wrong pixel sum.
    import struct
    import zlib

    payload = encode_png(4, 10, bytes(range(64)))
    pos, idat = 8, bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4:pos + 8]
        if typ == b"IDAT":
            idat += payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = 4 * 3
    filters = {raw[y * (stride + 1)] for y in range(10)}
    assert filters == {0, 1, 2, 3, 4}, filters


def test_png_corrupted_chunk_fails_crc():
    payload = bytearray(encode_png(4, 5, b"corruption test"))
    payload[45] ^= 0xFF
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(payload))


def test_png_unsupported_subset_raises():
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)  # RGBA
    chunk = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    comp = zlib.compress(b"\x00" * 9)
    idat = (
        struct.pack(">I", len(comp)) + b"IDAT" + comp
        + struct.pack(">I", zlib.crc32(b"IDAT" + comp))
    )
    with pytest.raises(NotImplementedError, match="8-bit RGB"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk + idat)


def test_unknown_magic_raises_value_error():
    with pytest.raises(ValueError, match="unrecognized image magic"):
        decode_image_header(b"GIF89a...")


def test_wav_roundtrip_signed_samples():
    import struct

    samples = struct.pack("<4h", 100, -200, 32767, -32768)
    rate, ch, bits, frames, sum_abs = decode_wav(encode_wav(16000, samples))
    assert (rate, ch, bits, frames) == (16000, 1, 16, 4)
    assert sum_abs == 100 + 200 + 32767 + 32768  # signed, not unsigned


def test_wav_decoder_walks_chunks_not_offset_44():
    # encode_wav puts a LIST chunk between fmt and data; a reader that
    # assumes samples start at byte 44 reads the LIST header as data.
    payload = encode_wav(8000, b"\x01\x00")
    assert payload[36:40] != b"data"
    rate, _, _, frames, sum_abs = decode_wav(payload)
    assert (rate, frames, sum_abs) == (8000, 1, 1)


def test_wav_odd_chunk_word_alignment():
    # A 3-byte odd-sized unknown chunk is padded to a word boundary;
    # the walker must skip the pad byte to find data.
    import struct

    data = b"\x05\x00"
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (
        b"junk" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    assert decode_wav(payload) == (8000, 1, 16, 1, 5)


def test_wav_non_pcm_raises():
    import struct

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)  # 85 = mp3
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(NotImplementedError, match="16-bit PCM"):
        decode_wav(payload)


def test_non_riff_raises_value_error():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")


# ------------------------------------------------------------- video


def test_y4m_roundtrip_and_sampling():
    from py_pubsub_pipeline_spark.multimodal import (
        decode_y4m_sample,
        encode_y4m,
    )

    w, h = 2, 3
    fsize = 3 * w * h
    frames = [bytes([f] * fsize) for f in range(5)]
    payload = encode_y4m(w, h, frames)
    # sampled frames 0, 2, 4 -> sums 0, 2*fsize, 4*fsize
    assert decode_y4m_sample(payload, every=2) == (
        w, h, 5, 3, (0 + 2 + 4) * fsize,
    )


def test_y4m_frame_marker_with_parameters_still_walks():
    # FRAME lines may carry parameters up to the newline; a walker
    # that assumes the marker is exactly 6 bytes drifts off-plane.
    from py_pubsub_pipeline_spark.multimodal import decode_y4m_sample

    head = b"YUV4MPEG2 W1 H1 F25:1 Ip A1:1 C444\n"
    payload = head + b"FRAME Xmeta\n" + bytes([7, 8, 9])
    assert decode_y4m_sample(payload, every=1) == (1, 1, 1, 1, 24)


def test_y4m_subsampled_colorspace_raises():
    from py_pubsub_pipeline_spark.multimodal import decode_y4m_sample

    payload = b"YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n" + b"\x00" * 6
    with pytest.raises(NotImplementedError, match="C444"):
        decode_y4m_sample(payload)


def test_y4m_truncated_frame_raises():
    from py_pubsub_pipeline_spark.multimodal import decode_y4m_sample

    payload = b"YUV4MPEG2 W2 H2 F25:1 C444\nFRAME\n" + b"\x00" * 5
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m_sample(payload)


def test_y4m_non_y4m_raises():
    from py_pubsub_pipeline_spark.multimodal import decode_y4m_sample

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m_sample(b"RIFF....\n")


# ---------------------------------------------------- perceptual hash


def test_bmp_topdown_roundtrip_preserves_logical_stream():
    from py_pubsub_pipeline_spark.multimodal import (
        decode_bmp_pixels, encode_bmp_topdown)
    px = bytes(range(3 * 5 * 4))  # w=5, h=4 -> rows need 1 pad byte
    w, h, out = decode_bmp_pixels(encode_bmp_topdown(5, 4, px))
    assert (w, h) == (5, 4)
    assert out == px  # stride padding stripped, order untouched


def test_ahash_invariant_under_uniform_brightness_shift():
    from py_pubsub_pipeline_spark.multimodal import ahash_bits
    base = bytes((i * 37) % 120 for i in range(273))
    for c in (1, 10, 100):
        shifted = bytes(b + c for b in base)  # < 256: no clipping
        assert ahash_bits(shifted) == ahash_bits(base)


def test_ahash_differs_for_different_content():
    from py_pubsub_pipeline_spark.multimodal import ahash_bits
    a = bytes((i * 37) % 120 for i in range(273))
    b = bytes(reversed(a))
    assert ahash_bits(a) != ahash_bits(b)


def test_ahash_empty_and_constant_images_are_zero():
    from py_pubsub_pipeline_spark.multimodal import ahash_bits
    assert ahash_bits(b"") == 0
    assert ahash_bits(b"\x42" * 100) == 0  # no block beats the mean
