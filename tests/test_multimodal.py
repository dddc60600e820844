"""Unit tests for the pure-stdlib image codecs: the synthesize/decode
round trip must recover exactly the encoded geometry, and formats
needing a real codec library must fail loudly (never silently wrong).
"""

from __future__ import annotations

import pytest

from py_pubsub_pipeline_spark.multimodal import (
    decode_image_header,
    encode_bmp,
    encode_ppm,
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


def test_jpeg_png_raise_not_implemented():
    with pytest.raises(NotImplementedError, match="image codec library"):
        decode_image_header(b"\xff\xd8\xff\xe0rest-of-jpeg")
    with pytest.raises(NotImplementedError, match="image codec library"):
        decode_image_header(b"\x89PNG\r\n\x1a\nrest-of-png")


def test_unknown_magic_raises_value_error():
    with pytest.raises(ValueError, match="unrecognized image magic"):
        decode_image_header(b"GIF89a...")
